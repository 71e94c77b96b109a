"""XMLTYPE binary decode (OLRX1 token stream → XML text) — the
Builder::parseXml surface: dictionary-referenced tags, attributes,
chunked/split text, nesting, self-closing elements, unknown-id policy."""

from __future__ import annotations

import struct

import pytest

from openlogreplicator_spark.functions.xmltype import (
    TOK_CLOSE,
    TOK_EOF,
    TOK_OPEN,
    TOK_TEXT,
    XML_MAGIC,
    decode_xmltype,
    encode_xmltype,
    xmltype_decode_udf,
)

TAGS = {1: "a", 2: "b", 3: "c"}
ATTRS = {1: "x", 2: "y"}
TAG_IDS = {v: k for k, v in TAGS.items()}
ATTR_IDS = {v: k for k, v in ATTRS.items()}


def test_roundtrip_nested():
    doc = ("a", {"x": "1"}, [
        ("b", {}, ["hello"]),
        ("c", {"y": "qz"}, []),
        "tail",
    ])
    xml = decode_xmltype(encode_xmltype(doc, TAG_IDS, ATTR_IDS), TAGS, ATTRS)
    assert xml == '<a x="1"><b>hello</b><c y="qz"/>tail</a>'


def test_text_chunks_concatenate():
    """Text may arrive split across multiple 0x8B chunks (the reference's
    64-bit chunk token) — they concatenate."""
    raw = bytearray(XML_MAGIC)
    raw.append(TOK_OPEN)
    raw.extend(struct.pack("<I", 1))
    for part in (b"he", b"llo"):
        raw.append(TOK_TEXT)
        raw.extend(struct.pack("<I", len(part)))
        raw.extend(part)
    raw.append(TOK_CLOSE)
    raw.append(TOK_EOF)
    assert decode_xmltype(bytes(raw), TAGS, ATTRS) == "<a>hello</a>"


def test_empty_element_self_closes():
    doc = ("a", {}, [])
    assert decode_xmltype(
        encode_xmltype(doc, TAG_IDS, ATTR_IDS), TAGS, ATTRS
    ) == "<a/>"


def test_unknown_tag_id_renders_placeholder():
    """Unknown dictionary ids warn-and-continue in the reference
    (60036); here they render a marked placeholder name."""
    doc = ("a", {}, [])
    blob = encode_xmltype(doc, {"a": 99}, {})
    assert decode_xmltype(blob, TAGS, ATTRS) == "<__unknown_tag_99/>"


def test_bad_magic_and_unclosed_rejected():
    with pytest.raises(ValueError, match="OLRX1"):
        decode_xmltype(b"JUNK00" + b"\xa0", TAGS, ATTRS)
    raw = bytearray(XML_MAGIC)
    raw.append(TOK_OPEN)
    raw.extend(struct.pack("<I", 1))
    raw.append(TOK_EOF)
    with pytest.raises(ValueError, match="unclosed"):
        decode_xmltype(bytes(raw), TAGS, ATTRS)


def test_decode_udf_on_spark(spark):
    docs = [
        ("a", {"x": str(i)}, [("b", {}, [f"v{i}"])]) for i in range(5)
    ]
    rows = [(i, encode_xmltype(d, TAG_IDS, ATTR_IDS)) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "id int, xml_bin binary")
    out = {
        r.id: r.xml
        for r in df.select(
            "id", xmltype_decode_udf(TAGS, ATTRS)("xml_bin").alias("xml")
        ).collect()
    }
    assert out[3] == '<a x="3"><b>v3</b></a>'


def test_torn_close_raises_valueerror_not_indexerror():
    """r12 review-pass-9: a close token with no open element (torn
    image) must follow the module's ValueError contract so callers can
    route it to the unknown render — an IndexError killed the Arrow
    task instead."""
    import pytest

    from openlogreplicator_spark.functions.xmltype import decode_xmltype

    with pytest.raises(ValueError, match="empty stack"):
        decode_xmltype(b"OLRX1\x00\xd9\xa0", {}, {})
