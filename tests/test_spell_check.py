"""Homoglyph spell-checker goldens (utils/spell_check_utils.py semantics)."""

import pytest

from effocr_tpu.utils.spell_check import (
    create_common_abbrev,
    create_homoglyph_dict,
    create_worddict,
    depunctuate,
    is_initial,
    is_number,
    majority_normalize,
    visual_spell_checker,
)


@pytest.fixture(scope="module")
def dicts():
    return create_worddict(), create_homoglyph_dict(), create_common_abbrev()


def test_homoglyph_word_repair(dicts):
    wd, sd, ab = dicts
    assert visual_spell_checker("fhe cat", wd, sd, ab).startswith("the")


def test_majority_normalize_digits_in_word(dicts):
    wd, sd, ab = dicts
    # majority_normalize takes the FIRST homoglyph ('1' -> 'l'), matching
    # spell_check_utils.py:107; the dictionary pass upgrades it to 'Main'
    assert majority_normalize("Ma1n", sd) == "Maln"
    assert majority_normalize("1l5", sd) == "115"
    assert majority_normalize("a1", sd) == "a1"  # balanced counts untouched
    assert visual_spell_checker("Ma1n St", wd, sd, ab).startswith("Main")


def test_spell_checker_keeps_numbers_and_caps(dicts):
    wd, sd, ab = dicts
    assert visual_spell_checker("1234", wd, sd, ab) == "1234"
    assert visual_spell_checker("NASA", wd, sd, ab) == "NASA"


def test_spell_checker_preserves_splitters(dicts):
    wd, sd, ab = dicts
    out = visual_spell_checker("fhe-cat/dog", wd, sd, ab)
    assert "-" in out and "/" in out


def test_abbrev_and_initial(dicts):
    wd, sd, ab = dicts
    assert is_initial("J.")
    assert not is_initial("Jo")
    assert is_number("1,234")
    assert depunctuate("a,b.c") == "abc"


def test_unfixable_word_unchanged(dicts):
    wd, sd, ab = dicts
    assert visual_spell_checker("qqqq", wd, sd, ab) == "qqqq"


def test_homoglyph_pairs_load_merge(tmp_path):
    from effocr_tpu.utils.spell_check import (
        create_homoglyph_dict,
        load_homoglyph_pairs,
        merge_homoglyphs,
    )

    p = tmp_path / "hg.txt"
    p.write_text("u n\nF P\n\nbad line with extra\n")
    extra = load_homoglyph_pairs(str(p))
    assert extra["u"] == ["n"] and extra["n"] == ["u"]
    assert extra["F"] == ["P"] and extra["P"] == ["F"]
    merged = merge_homoglyphs(create_homoglyph_dict(), extra)
    # base entries kept, extras appended without dupes
    assert merged["l"][:2] == ["i", "1"]
    assert "n" in merged["u"]
    base = create_homoglyph_dict()
    assert "u" not in base  # confirms the extension is additive


def test_spell_checker_uses_extra_pairs(tmp_path):
    from effocr_tpu.utils.spell_check import (
        create_common_abbrev,
        create_homoglyph_dict,
        create_worddict,
        load_homoglyph_pairs,
        merge_homoglyphs,
        visual_spell_checker,
    )

    wd = create_worddict()
    wd["amount"] = 1000
    base = create_homoglyph_dict()
    ab = create_common_abbrev()
    # base table lacks n->u, so 'amonnt' stays broken
    assert visual_spell_checker("amonnt", wd, base, ab) == "amonnt"
    p = tmp_path / "hg.txt"
    p.write_text("u n\n")
    vs = merge_homoglyphs(base, load_homoglyph_pairs(str(p)))
    assert visual_spell_checker("amonnt", wd, vs, ab) == "amount"
