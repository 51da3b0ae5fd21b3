import numpy as np
import pytest

from ocrjax.charset import Charset, default_charset


def test_roundtrip():
    cs = default_charset()
    text = "Hello, World! 42"
    ids = cs.encode(text)
    assert all(i >= 1 for i in ids)
    assert cs.decode(ids) == text


def test_blank_is_zero_and_skipped():
    cs = Charset("abc")
    assert cs.blank_id == 0
    assert cs.num_classes == 4
    assert cs.decode([0, 1, 0, 2, 0, 3]) == "abc"
    assert cs.decode([99, 1]) == "a"  # out-of-range ids skipped


def test_unknown_char_raises():
    cs = Charset("abc")
    with pytest.raises(KeyError):
        cs.encode("abd")


def test_duplicate_chars_rejected():
    with pytest.raises(ValueError):
        Charset("aab")


def test_encode_array_padding():
    cs = Charset("abc")
    arr = cs.encode_array("ab", 5)
    np.testing.assert_array_equal(arr, [1, 2, 0, 0, 0])
    assert arr.dtype == np.int32


def test_file_roundtrip(tmp_path):
    cs = Charset("ab c")
    p = tmp_path / "dict.txt"
    cs.to_file(str(p))
    cs2 = Charset.from_file(str(p))
    assert cs2.chars == cs.chars
    assert " " in cs2
