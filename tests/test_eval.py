"""Golden tests for textline_evaluation parity with the reference semantics."""

import pytest

from effocr_tpu.eval import edit_distance, string_cleaner, textline_evaluation


def test_edit_distance_matches_nltk():
    nltk = pytest.importorskip("nltk.metrics.distance")
    cases = [
        ("", ""), ("a", ""), ("", "abc"), ("kitten", "sitting"),
        ("flaw", "lawn"), ("日本語の文", "日本語文"), ("abc", "abc"),
        ("The quick brown fox", "The quick brwn fx"),
        ("intention", "execution"),
    ]
    for a, b in cases:
        assert edit_distance(a, b) == nltk.edit_distance(a, b), (a, b)


def test_string_cleaner():
    assert string_cleaner("“quote”") == '"quote"'
    assert string_cleaner("''x''") == '"x"'
    assert string_cleaner("a\nb") == "ab"


def test_textline_accuracy_and_cer():
    pairs = [("hello world", "hello world"), ("abcd", "abce")]
    acc, cer = textline_evaluation(pairs)
    assert acc == 50.0
    # 1 edit over 15 raw gt chars (len counted before strip/clean)
    assert cer == pytest.approx(1 / 15)


def test_textline_no_spaces_and_uncased():
    pairs = [("A B", "ab")]
    acc, cer = textline_evaluation(pairs, no_spaces_in_eval=True, uncased=True)
    assert acc == 100.0
    assert cer == 0.0


def test_norm_edit_distance_uses_longer_denominator():
    pairs = [("abcdef", "abc")]
    acc, ned = textline_evaluation(pairs, norm_edit_distance=True)
    assert acc == 0.0
    assert ned == pytest.approx(3 / 6)


def test_norm_edit_distance_pred_longer():
    pairs = [("abc", "abcdef")]
    _, ned = textline_evaluation(pairs, norm_edit_distance=True)
    assert ned == pytest.approx(3 / 6)
