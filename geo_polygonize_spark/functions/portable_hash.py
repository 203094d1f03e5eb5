"""Portable integer hash expressions — bit-identical in Spark SQL and
DuckDB SQL.

The production dedup operators hash shingles with ``xxhash64`` (JVM
native, fastest). xxhash64 does not exist in DuckDB, so driver-oracle
queries that must be replicated verbatim by the DuckDB harness use the
"portable" family below instead: every step is exact 64-bit integer
arithmetic built only from functions both engines share (``lower``,
``length``, ``greatest``, ``ascii``, ``substr``, ``CASE``, ``%``,
``>>``, ``&``, ``CAST``).  The two generators in this module emit the
same algorithm for either engine, so a hash mismatch in the driver's
CORRECTNESS gate means the *operator logic* diverged, not the hash.

* shingle hash — exact base-131 positional encoding of the n-gram
  (ASCII codes < 131, so for fixed n it is injective: zero shingle
  collisions by construction, strictly stronger than xxhash64 here).
* bit mixers — h_b(x) = (a_b * (x mod p) + c_b) mod p with
  p = 2^31 - 1; bit 30 of h_b is the simhash vote bit b. All
  intermediates < 2^62: no BIGINT overflow under Spark ANSI mode or
  DuckDB.
* simhash — 62 bits (bits 0..61): DuckDB raises on ``1 << 63`` and
  bit 62 is left unused to keep every literal ``2**b`` positive.

Reference analog: the reference's only hashing is NodeKey f64-bit
coordinate hashing (src/graph/planar_graph.rs:62-70); text hashing is
engine-side, training-data territory (SURVEY.md §2.8 payload fns).
"""

from __future__ import annotations

import numpy as np

M31 = (1 << 31) - 1
PORTABLE_SIMHASH_BITS = 62
_SIMHASH_SEED = 7


def mix_params(n_bits: int = PORTABLE_SIMHASH_BITS, seed: int = _SIMHASH_SEED):
    """Deterministic (a_b, c_b) linear-mixer constants, embedded as
    literals in BOTH engines' SQL."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, M31, size=n_bits, dtype=np.int64)
    c = rng.integers(0, M31, size=n_bits, dtype=np.int64)
    return a, c


def _poly131(text_expr: str, i_expr: str, n: int) -> str:
    """Base-131 value of the n-gram of ``text_expr`` at 1-based offset
    ``i_expr`` (engine-neutral). ascii('') = 0 in both engines, so
    texts shorter than n zero-pad identically."""
    terms = [
        f"CAST(ascii(substr({text_expr}, CAST({i_expr} + {j} AS INTEGER), 1)) AS BIGINT)"
        f" * {131 ** (n - 1 - j)}"
        for j in range(n)
    ]
    return "(" + " + ".join(terms) + ")"


def shingle_list_sql(text_expr: str, n: int, engine: str) -> str:
    """Distinct base-131 n-gram codes of ``lower(text_expr)`` as an
    array/list expression for ``engine`` in {'spark', 'duckdb'}."""
    t = f"lower({text_expr})"
    hi = f"greatest(length({t}) - {n - 1}, 1)"
    body = _poly131(t, "i", n)
    if engine == "spark":
        return f"array_distinct(transform(sequence(1, {hi}), i -> {body}))"
    if engine == "duckdb":
        return f"list_distinct(list_transform(range(1, {hi} + 1), i -> {body}))"
    raise ValueError(f"unknown engine {engine!r}")


def _vote_sql(sh_expr: str, a: int, c: int, engine: str) -> str:
    """Σ over the shingle list of ±1 by bit 30 of the linear mixer."""
    case = (
        f"CASE WHEN ((({a} * (x % {M31}) + {c}) % {M31}) >> 30) & 1 = 1 "
        f"THEN 1 ELSE -1 END"
    )
    if engine == "spark":
        return f"aggregate({sh_expr}, 0L, (acc, x) -> acc + ({case}))"
    return f"list_sum(list_transform({sh_expr}, x -> {case}))"


def simhash_sql(
    sh_expr: str,
    n_bits: int = PORTABLE_SIMHASH_BITS,
    seed: int = _SIMHASH_SEED,
    engine: str = "spark",
) -> str:
    """The full portable simhash as ONE scalar expression over a
    shingle array/list column: bit b set iff the majority of shingle
    mixers h_b have bit 30 set."""
    if n_bits > PORTABLE_SIMHASH_BITS:
        raise ValueError("portable simhash is capped at 62 bits (DuckDB 1<<63 overflows)")
    a, c = mix_params(n_bits, seed)
    terms = [
        f"(CASE WHEN ({_vote_sql(sh_expr, int(a[b]), int(c[b]), engine)}) > 0 "
        f"THEN {2 ** b} ELSE 0 END)"
        for b in range(n_bits)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"
