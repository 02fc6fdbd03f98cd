"""Operator library (SURVEY.md §2.B-§2.J).

Most relational operators (§2.B-§2.H) ARE the PySpark DataFrame surface —
we deliberately add no wrapper layer that would hide the logical plan from
Catalyst.  This package holds the operators that carry real semantics:
deterministic variants (keyed dedup, tie-broken top-k), window composites
(sessionize), and the domain operators (text, similarity, dedup).
"""
