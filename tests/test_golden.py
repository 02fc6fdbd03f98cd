"""Golden-file gate (SURVEY §5.3.5): flagship output pinned exactly.

Catches silent semantic drift (a changed join, filter, or decimal rule)
that row-count/schema checks would miss.  Regenerate ONLY on an
intentional semantic change, with the diff explained in the commit.
"""

from __future__ import annotations

import decimal

import __spark_entry__ as contract

#: entry() on sf0.001, in order (revenue DESC, custkey ASC).
GOLDEN = [
    (70, "Customer#000000070", "MIDDLE EAST", "4182449.647500"),
    (131, "Customer#000000131", "EUROPE", "3845956.879200"),
    (19, "Customer#000000019", "AMERICA", "3594608.891600"),
    (54, "Customer#000000054", "ASIA", "3583848.114800"),
    (65, "Customer#000000065", "EUROPE", "3541531.224300"),
    (139, "Customer#000000139", "AFRICA", "3342253.518700"),
    (36, "Customer#000000036", "AMERICA", "3340274.320000"),
    (119, "Customer#000000119", "ASIA", "3300236.662300"),
    (112, "Customer#000000112", "EUROPE", "3295879.276800"),
    (58, "Customer#000000058", "EUROPE", "3283165.040600"),
]


def test_flagship_matches_golden(spark):
    rows = contract.entry(spark).collect()
    got = [
        (
            r["c_custkey"],
            r["c_name"],
            r["r_name"],
            str(decimal.Decimal(r["revenue"])),
        )
        for r in rows
    ]
    assert got == GOLDEN
