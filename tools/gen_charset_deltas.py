"""Differential-testing generator for functions/charset_extra.py.

Reads the reference's KO16KSCCS / ZHT16HKSCS31 Unicode tables
(/root/reference/src/locales/CharacterSet*.cpp — studied as behavior, not
shipped), simulates the rule-based decoders in charset_extra.py over every
(lead, trail) position, and prints the residual delta maps plus a full-table
mismatch count (must be 0). Re-run after any rule change:

    python tools/gen_charset_deltas.py
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

REF = "/root/reference/src/locales"


def load_map(name: str):
    src = open(f"{REF}/CharacterSet{name}.cpp").read()
    hdr = open(f"{REF}/CharacterSet{name}.h").read()
    bounds = {}
    for m in re.finditer(r"(\w+_b[12]_(?:min|max))\{(0x[0-9A-Fa-f]+|\d+)\}", hdr + src):
        bounds[m.group(1)] = int(m.group(2), 0)
    start = src.index("{", src.index(f"unicode_map_{name}_2b["))
    end = src.index("};", start)
    nums = [int(x, 16) for x in re.findall(r"0x[0-9A-Fa-f]+", src[start:end])]
    b1min, b2min = bounds[f"{name}_b1_min"], bounds[f"{name}_b2_min"]
    width = bounds[f"{name}_b2_max"] - b2min + 1
    return b1min, b2min, width, nums


def check(name: str, pair_fn) -> int:
    b1min, b2min, width, nums = load_map(name)
    bad = 0
    for i, v in enumerate(nums):
        b1, b2 = b1min + i // width, b2min + i % width
        got = ord(pair_fn(b1, b2))
        if got != v:
            bad += 1
            if bad <= 10:
                print(f"  MISMATCH {name} ({b1:#x},{b2:#x}): ref {v:#x} got {got:#x}")
    print(f"{name}: {len(nums)} positions, {bad} mismatches")
    return bad


if __name__ == "__main__":
    from openlogreplicator_spark.functions.charset_extra import (
        _decode_pair_hkscs31,
        _decode_pair_ksccs,
    )

    rc = check("KO16KSCCS", _decode_pair_ksccs)
    rc += check("ZHT16HKSCS31", _decode_pair_hkscs31)
    sys.exit(1 if rc else 0)
