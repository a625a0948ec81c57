"""Human-readable size parse/format (C7).

Reference semantics: ``ParseSize`` (/root/reference/files/utils.go:236-296)
turns "1.5G" / "500M" / "10K" / bare ints into bytes with binary (1024)
multipliers; ``formatSize`` (/root/reference/files/import.go:123-134)
prints "%.1f <K|M|G|T|P|E>B" with binary units, bytes below 1 KiB as
"N B".

``parse_size``/``format_size`` are plain Python for CLI knobs and report
summaries (driver-side scalars, exactly where the reference uses them).
``format_size_col`` is the same formatting as a native column expression
so report tables can carry a human column without leaving codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_UNITS = {"": 1, "B": 1}
for _i, _u in enumerate(["K", "M", "G", "T", "P", "E"]):
    _UNITS[_u] = _UNITS[_u + "B"] = 1024 ** (_i + 1)


def parse_size(size_str: str | int | None) -> int:
    """"1.5G" → 1610612736. Bare integers are bytes; empty/None → 0.

    Mirrors files/utils.go:236 ParseSize: numeric prefix + unit suffix,
    units K/M/G/T (and KB/MB/...), case-insensitive, binary multipliers.
    Raises ValueError on an unknown unit or a malformed number.
    """
    if size_str is None:
        return 0
    if isinstance(size_str, int):
        return size_str
    s = size_str.strip()
    if not s:
        return 0
    try:
        return int(s)
    except ValueError:
        pass
    num = ""
    unit = ""
    for i, c in enumerate(s):
        if c.isdigit() or c == ".":
            num += c
        else:
            unit = s[i:].strip().upper()
            break
    if not num:
        raise ValueError(f"invalid size format: {size_str}")
    try:
        value = float(num)
    except ValueError:
        raise ValueError(f"invalid number in size: {size_str}") from None
    if unit not in _UNITS:
        raise ValueError(f"unknown size unit: {unit}")
    return int(value * _UNITS[unit])


def format_size(size: int) -> str:
    """1536 → "1.5 KB". Mirrors files/import.go:123 formatSize."""
    if size < 1024:
        return f"{size} B"
    div, exp = 1024, 0
    n = size // 1024
    while n >= 1024:
        div *= 1024
        exp += 1
        n //= 1024
    return f"{size / div:.1f} {'KMGTPE'[exp]}B"


def format_size_col(col: str | Column) -> Column:
    """format_size as a native column expression (stays in codegen)."""
    c = F.col(col) if isinstance(col, str) else col
    expr = F.when(c < 1024, F.concat(c.cast("string"), F.lit(" B")))
    div = 1024
    for u in "KMGTP":
        hi = div * 1024
        expr = expr.when(
            c < hi,
            F.concat(F.format_string("%.1f", c / F.lit(float(div))), F.lit(f" {u}B")),
        )
        div = hi
    return expr.otherwise(
        F.concat(F.format_string("%.1f", c / F.lit(float(div))), F.lit(" EB"))
    )
