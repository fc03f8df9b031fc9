"""Built-in charset generation.

The reference ships tab-separated charset files (english_charsets/: digits,
letters, punctuation; japan_charsets/: JIS X 0213 / Adobe-Japan1 lists).
English charsets are fully derivable — this generates equivalent files so a
user can bootstrap without the reference's assets.  Japanese charsets come
from the standards; point --charset_dir at your own lists (same format:
``NAME\\t<decimal codepoint>\\t<char>`` per line).
"""

from __future__ import annotations

import os
import string
from typing import Dict, List

EN_PUNCTUATION = list("!\"#$%&'()*+,-./:;?@[]_{}“”‘’")


def english_charsets() -> Dict[str, List[str]]:
    return {
        "digits": list(string.digits),
        "letters": list(string.ascii_letters),
        "punctuation": EN_PUNCTUATION,
    }


def write_charset_dir(save_dir: str, charsets: Dict[str, List[str]] = None
                      ) -> List[str]:
    """Write tab-separated charset files in the reference's format."""
    charsets = charsets or english_charsets()
    os.makedirs(save_dir, exist_ok=True)
    paths = []
    for name, chars in charsets.items():
        path = os.path.join(save_dir, f"{name}.txt")
        with open(path, "w") as f:
            f.write("\n".join(
                f"{name.upper()}\t{ord(c)}\t{c}" for c in chars
            ))
        paths.append(path)
    return paths
