"""Text-line evaluation: exact-match accuracy + CER / normalized edit distance.

Semantics-parity reimplementation of the reference metric
(utils/eval_utils.py:25-70): quote normalization (:14-22), optional
space-stripping/uncasing (:42-45), exact line accuracy, and either
CER = total_edits / total_gt_chars or the ICDAR2019 normalized edit distance
(:54-59).  The edit distance is a standard Levenshtein DP, equivalent to
nltk.metrics.distance.edit_distance with default costs.
"""

from __future__ import annotations

from typing import Iterable, List, Sequence, Tuple

_QUOTE_SUBS = (
    ("“", '"'),   # left double quote
    ("”", '"'),   # right double quote
    ("''", '"'),
    ("‘‘", '"'),
    ("’’", '"'),
    ("\n", ""),
)


def string_cleaner(s: str) -> str:
    """Quote/newline normalization, matching utils/eval_utils.py:14-22."""
    for old, new in _QUOTE_SUBS:
        s = s.replace(old, new)
    return s


def edit_distance(a: str, b: str) -> int:
    """Levenshtein distance (insert/delete/substitute, unit costs)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    # keep the shorter string in the inner dimension
    if lb > la:
        a, b, la, lb = b, a, lb, la
    prev = list(range(lb + 1))
    cur = [0] * (lb + 1)
    for i in range(1, la + 1):
        cur[0] = i
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cost = 0 if ca == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev, cur = cur, prev
    return prev[lb]


def textline_evaluation(
    pairs: Sequence[Tuple[str, str]],
    print_incorrect: bool = False,
    no_spaces_in_eval: bool = False,
    norm_edit_distance: bool = False,
    uncased: bool = False,
) -> Tuple[float, float]:
    """Return (accuracy_percent, cer_or_normED) over (gt, pred) pairs.

    Matches utils/eval_utils.py:25-70 exactly, including the detail that
    ``n_chars`` counts raw GT lengths *before* cleaning/stripping.
    """
    n_correct = 0
    edit_count = 0.0
    length_of_data = len(pairs)
    n_chars = sum(len(gt) for gt, _ in pairs)

    for gt, pred in pairs:
        pred, gt = string_cleaner(pred), string_cleaner(gt)
        if no_spaces_in_eval:
            gt = gt.strip().replace(" ", "")
            pred = pred.strip().replace(" ", "")
        else:
            gt = gt.strip()
            pred = pred.strip()
        if uncased:
            pred, gt = pred.lower(), gt.lower()

        if pred == gt:
            n_correct += 1
        elif print_incorrect:
            print(f"GT: {gt}\nPR: {pred}\n")

        if norm_edit_distance:
            denom = len(gt) if len(gt) > len(pred) else len(pred)
            edit_count += edit_distance(pred, gt) / denom
        else:
            edit_count += edit_distance(pred, gt)

    accuracy = n_correct / float(length_of_data) * 100
    cer = edit_count / float(length_of_data) if norm_edit_distance else edit_count / n_chars
    return accuracy, cer
