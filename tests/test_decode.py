"""P1 decode fallback chain — each branch of decoding.py:37-55."""

from __future__ import annotations

from language_diversity_common_crawler_spark.functions.decode import decode_bytes


def test_default_charset_none_is_utf8():
    assert decode_bytes("héllo".encode("utf-8"), None) == "héllo"


def test_utf7_treated_as_utf8():
    assert decode_bytes("héllo".encode("utf-8"), "utf-7") == "héllo"


def test_utf8_falls_back_to_iso8859_1():
    b = "café".encode("iso-8859-1")  # 0xE9 invalid as utf-8 continuation
    assert decode_bytes(b, "utf-8") == "café"


def test_gbk_falls_back_to_gb18030():
    s = "data \U0001F600 end"  # 4-byte gb18030 sequence, invalid in gbk
    assert decode_bytes(s.encode("gb18030"), "gbk") == s


def test_shift_jis_falls_back_to_x0213():
    s = "data ① end"
    assert decode_bytes(s.encode("shift_jisx0213"), "shift_jis") == s


def test_euc_jp_falls_back_to_x0213():
    s = "data ① end"
    assert decode_bytes(s.encode("euc_jisx0213"), "euc-jp") == s


def test_windows_1251_falls_back_to_utf8():
    s = "quote ‘ here"  # U+2018 utf-8 contains 0x98, undefined in cp1251
    assert decode_bytes(s.encode("utf-8"), "windows-1251") == s


def test_windows_1251_native_ok():
    s = "привет"
    assert decode_bytes(s.encode("windows-1251"), "windows-1251") == s


def test_unchained_charset_gives_sentinel_null():
    assert decode_bytes("é".encode("utf-8"), "ascii") is None


def test_unknown_codec_gives_null():
    assert decode_bytes(b"abc", "x-bogus-charset") is None


def test_iso8859_1_never_fails():
    assert decode_bytes(bytes(range(256)), "iso-8859-1") is not None
