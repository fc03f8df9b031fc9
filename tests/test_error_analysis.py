"""Error-breakdown analysis (eval/error_analysis.py)."""

import numpy as np
import pytest

from effocr_tpu.eval.error_analysis import ErrorBreakdown, align_ops, analyze_pairs
from effocr_tpu.eval.textline import edit_distance, textline_evaluation


def test_align_ops_costs_match_edit_distance():
    rng = np.random.default_rng(0)
    alpha = "abc X"
    for _ in range(60):
        gt = "".join(rng.choice(list(alpha), rng.integers(0, 12)))
        pr = "".join(rng.choice(list(alpha), rng.integers(0, 12)))
        ops = align_ops(gt, pr)
        cost = sum(1 for op, _, _ in ops if op != "match")
        assert cost == edit_distance(gt, pr), (gt, pr)
        # ops reconstruct both strings
        assert "".join(g for op, g, _ in ops if op != "ins") == gt
        assert "".join(p for op, _, p in ops if op != "del") == pr


def test_categories():
    pairs = [
        ("Hello world", "hello world"),      # 1 case sub
        ("a b", "ab"),                       # 1 missing space
        ("ab", "a b"),                       # 1 spurious space
        ("abc", "axc"),                      # 1 substitution b->x
        ("abc", "abxc"),                     # 1 char insertion
        ("abc", "ac"),                       # 1 char deletion
        ("same", "same"),
    ]
    bd = analyze_pairs(pairs, clean=False)
    assert bd.n_lines == 7 and bd.n_exact == 1
    assert bd.case_subs == 1
    assert bd.space_del == 1 and bd.space_ins == 1
    assert bd.other_subs == 1 and bd.confusions[("b", "x")] == 1
    assert bd.char_ins == 1 and bd.char_del == 1
    assert bd.edits == 6
    assert bd.lines_case_only == 1
    assert bd.lines_space_only == 2
    assert bd.lines_sub_only == 1


def test_cer_reconciles_with_textline_evaluation():
    pairs = [
        ("The quick brown fox", "The quick brawn fax"),
        ("jumps over", "jumps ovr"),
        ("the lazy dog", "the lazy dog"),
        ("“quoted” text", '"quoted" text'),  # cleaner-normalized
    ]
    acc, cer = textline_evaluation(pairs)
    bd = analyze_pairs(pairs)
    assert bd.cer == pytest.approx(cer)
    assert bd.n_exact / bd.n_lines * 100 == pytest.approx(acc)


def test_summary_shares_sum_to_one():
    bd = analyze_pairs([("abcd e", "aXcde")], clean=False)
    s = bd.summary()
    total = sum(v[0] for v in s["by_category"].values())
    assert total == s["edits"] == bd.edits


FONT = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"


def test_confusion_render_distance_identity_and_difference():
    import os

    if not os.path.exists(FONT):
        pytest.skip("DejaVu font not present")
    from effocr_tpu.eval.error_analysis import confusion_render_distance

    # Latin A vs Cyrillic А vs Greek Α: DejaVu reuses the same outline
    pairs = [("A", "А"), ("A", "B"), ("A", "A"), ("l", "I")]
    d = confusion_render_distance(pairs, [FONT])
    assert d[("A", "A")] == 0.0
    assert d[("A", "А")] == 0.0, "cross-script clone must be identical"
    assert d[("A", "B")] > 0.05
    # sans-serif l vs I are nearly identical but distinguishable
    assert 0.0 <= d[("l", "I")] < d[("A", "B")]


def test_dedupe_render_identical():
    import os

    if not os.path.exists(FONT):
        pytest.skip("DejaVu font not present")
    from effocr_tpu.data.fonts import dedupe_render_identical

    chars = ["A", "B", "А", "Α", "c"]  # Latin, Cyrillic А, Greek Α
    kept, dropped = dedupe_render_identical(chars, [FONT])
    assert kept[0] == "A" and "B" in kept and "c" in kept
    assert {d for d, _ in dropped} == {"А", "Α"}
    assert all(k == "A" for _, k in dropped)


def test_dedupe_merges_across_differing_font_coverage(monkeypatch):
    """Twins must merge when identical in every COMMON font, even if one
    codepoint is missing from some fonts' cmaps (Kangxi-radical case:
    U+2FBB renders identically to U+5F73 but lives in fewer fonts)."""
    import os

    if not os.path.exists(FONT):
        pytest.skip("DejaVu font not present")
    import effocr_tpu.data.fonts as F

    font2 = FONT.replace("DejaVuSans.ttf", "DejaVuSansMono.ttf")
    real = F.get_unicode_coverage_from_ttf

    def fake_coverage(fp):
        blocks, covered = real(fp)
        if fp == font2:  # second font "lacks" the Cyrillic twin
            covered = [c for c in covered if c != "А"]
        return blocks, covered

    monkeypatch.setattr(F, "get_unicode_coverage_from_ttf", fake_coverage)
    kept, dropped = F.dedupe_render_identical(["A", "А", "B"], [FONT, font2])
    assert ("А", "A") in dropped, (kept, dropped)
    assert "B" in kept and "A" in kept


def test_dedupe_tol_merges_near_identical():
    import os

    if not os.path.exists(FONT):
        pytest.skip("DejaVu font not present")
    from effocr_tpu.data.fonts import dedupe_render_identical

    # sans-serif l vs I: tiny render distance, not pixel-identical
    kept0, dropped0 = dedupe_render_identical(["l", "I"], [FONT])
    assert not dropped0
    kept1, dropped1 = dedupe_render_identical(["l", "I"], [FONT], tol=0.05)
    assert dropped1 == [("I", "l")], (kept1, dropped1)
