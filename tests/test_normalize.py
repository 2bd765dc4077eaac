"""Unicode normalization functions (functions/normalize.py).

Non-ASCII test inputs are built from explicit code points — literal
invisible characters in source are exactly the bug class under test.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from d2d_spark.functions.normalize import (
    normalize_punctuation,
    normalize_spaces,
    normalize_text,
    strip_control_chars,
)

NBSP, THIN, IDEO = chr(0x00A0), chr(0x2009), chr(0x3000)
ZWSP, ZWJ, BOM, SHY = chr(0x200B), chr(0x200D), chr(0xFEFF), chr(0x00AD)
LSQ, RSQ, LDQ, RDQ = chr(0x2018), chr(0x2019), chr(0x201C), chr(0x201D)
ENDASH, EMDASH, MINUS, ELLIP = chr(0x2013), chr(0x2014), chr(0x2212), chr(0x2026)
LINESEP = chr(0x2028)


def _run(spark, fn, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    rows = df.select("i", fn(F.col("t")).alias("o")).collect()
    return [r["o"] for r in sorted(rows, key=lambda r: r["i"])]


def test_control_and_invisible_strip(spark):
    got = _run(
        spark,
        strip_control_chars,
        [
            "a\x00b\x01c",
            "keep\ttabs\nand newlines",
            "crlf\r\nand cr\rsurvive as newlines",
            f"zero{ZWSP}width{ZWJ}join{BOM}ers",
            f"soft{SHY}hyphen",
            "c1\x85block\x9f",
        ],
    )
    assert got[0] == "abc"
    assert got[1] == "keep\ttabs\nand newlines"
    assert got[2] == "crlf\nand cr\nsurvive as newlines"
    assert got[3] == "zerowidthjoiners"
    assert got[4] == "softhyphen"
    assert got[5] == "c1block"


def test_space_and_punct_folds(spark):
    got = _run(
        spark,
        normalize_text,
        [
            f"non{NBSP}breaking thin{THIN}and{IDEO}ideographic",
            f"{LDQ}quoted{RDQ} and {LSQ}single{RSQ}",
            f"en{ENDASH}dash em{EMDASH}dash minus{MINUS}5",
            f"wait{ELLIP} really{ELLIP}",
            "".join(chr(ord(c) + 0xFEE0) for c in "fullwidth!"),
            f"line{LINESEP}separated",
        ],
    )
    assert got[0] == "non breaking thin and ideographic"
    assert got[1] == '"quoted" and \'single\''
    assert got[2] == "en-dash em-dash minus-5"
    assert got[3] == "wait... really..."
    assert got[4] == "fullwidth!"
    assert got[5] == "line separated"


def test_idempotent_and_ascii_passthrough(spark):
    texts = [
        "plain ascii stays untouched. 100%!",
        f"m{EMDASH}ixed {LDQ}bag{RDQ} of{ZWSP} everything{ELLIP}\r\n",
    ]
    once = _run(spark, normalize_text, texts)
    twice = _run(spark, normalize_text, once)
    assert once == twice, "normalize_text must be idempotent"
    assert once[0] == texts[0], "ASCII must pass through byte-identical"


def test_normalization_canonicalizes_dedup_keys(spark):
    """The point of the pass: typographic variants of one sentence
    must fingerprint identically after normalization."""
    from d2d_spark.functions.text import fingerprint

    a = "It's a \"test\" - nothing more..."
    b = f"It{RSQ}s a {LDQ}test{RDQ} {ENDASH} nothing{NBSP}more{ELLIP}"
    df = spark.createDataFrame([(1, a), (2, b)], "i long, t string")
    fps = df.select(fingerprint(normalize_text(F.col("t"))).alias("fp")).collect()
    assert fps[0]["fp"] == fps[1]["fp"]


def test_partial_folds_compose(spark):
    got_sp = _run(spark, normalize_spaces, [f"a{NBSP}b{IDEO}c"])
    assert got_sp == ["a b c"]
    got_p = _run(spark, normalize_punctuation, [f"{LSQ}x{RSQ} {chr(0x2033)}y{chr(0x2033)}"])
    assert got_p == ["'x' \"y\""]
