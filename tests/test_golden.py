"""Golden-file gate (SURVEY §5.3.5): flagship output pinned exactly.

Catches silent semantic drift (a changed join, filter, or decimal rule)
that row-count/schema checks would miss.  Regenerate ONLY on an
intentional semantic change, with the diff explained in the commit.
"""

from __future__ import annotations

import __spark_entry__ as contract

#: entry() on sf0.001, in order (revenue DESC, custkey ASC).  Revenue is
#: the r2 contract form: exact DECIMAL(38,6) accumulation, final-projected
#: round(cast(double), 6) — same digits as the r1 decimal golden.
GOLDEN = [
    (70, "Customer#000000070", "MIDDLE EAST", 4182449.6475),
    (131, "Customer#000000131", "EUROPE", 3845956.8792),
    (19, "Customer#000000019", "AMERICA", 3594608.8916),
    (54, "Customer#000000054", "ASIA", 3583848.1148),
    (65, "Customer#000000065", "EUROPE", 3541531.2243),
    (139, "Customer#000000139", "AFRICA", 3342253.5187),
    (36, "Customer#000000036", "AMERICA", 3340274.32),
    (119, "Customer#000000119", "ASIA", 3300236.6623),
    (112, "Customer#000000112", "EUROPE", 3295879.2768),
    (58, "Customer#000000058", "EUROPE", 3283165.0406),
]


def test_flagship_matches_golden(spark):
    rows = contract.entry(spark).collect()
    got = [
        (r["c_custkey"], r["c_name"], r["r_name"], r["revenue"]) for r in rows
    ]
    assert got == GOLDEN
