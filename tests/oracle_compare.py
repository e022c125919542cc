"""Local stand-in for the driver's DuckDB oracle comparison: row-count,
column-name-sorted schema, and order-insensitive value compare (exact for
ints/strings, tolerant only in the last float bits)."""

from __future__ import annotations

import math


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def rows_to_canonical(cols, rows):
    """Sort columns by name, then rows lexicographically → list of tuples."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return [cols[i] for i in order], out


def compare_frames(spark_df, duck_rel, rtol=0.0):
    """Returns (ok, message). Exact match expected by default."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols = [d[0] for d in duck_rel.description]
    d_rows = duck_rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"rowcount mismatch: spark={len(s_rows)} duck={len(d_rows)}"

    sc, s_canon = rows_to_canonical(s_cols, s_rows)
    dc, d_canon = rows_to_canonical(d_cols, d_rows)
    for i, (a, b) in enumerate(zip(s_canon, d_canon)):
        for j, (x, y) in enumerate(zip(a, b)):
            if x == y:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isclose(x, y, rel_tol=rtol, abs_tol=0.0):
                    continue
            # datetime/date equality across libs
            if str(x) == str(y):
                continue
            return False, (
                f"value mismatch row {i} col {sc[j]}: spark={x!r} duck={y!r}"
            )
    return True, "ok"
