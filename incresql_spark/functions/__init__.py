"""Engine function library.

``hashing`` — deterministic cross-engine hash primitives (the foundation of
the oracle-matched dedup/similarity operators).
``json`` — MySQL-flavoured JSON semantics (``->``/``->>``/json_unquote) on
top of Spark's JSON functions (reference parity, SURVEY §2.3).
"""
