"""The slicer cut grammar, compiled to Catalyst ``Column`` predicates.

Grammar (reference contract: /root/reference/HOWTO.md:73-91 and the pinned
cubes dependency's cut syntax, requirements.txt:1):

    cut_param  := cut ('|' cut)*          # multiple cuts are ANDed
    cut        := ['!'] dim ':' spec      # '!' negates the whole cut
    spec       := range | set | point
    range      := [lo] '~' [hi]           # inclusive; open ends allowed
    set        := value (';' value)+      # membership
    point      := value                   # exact, case-sensitive equality

Colons are reserved by the grammar — hence the reference's ETL scrubs them out
of title columns (assets_generator.py:429-431,518-520). Values arrive
URL-decoded (the HTTP layer decodes; this module sees plain strings).

Everything compiles to built-in Column expressions — no UDFs — so Catalyst
pushes every cut down to the Parquet scan (predicate pushdown + partition
pruning are what make point/range cuts cheap at 100 TB).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F


class CutParseError(ValueError):
    pass


@dataclass(frozen=True)
class PointCut:
    dim: str
    value: str
    invert: bool = False

    def to_string(self) -> str:
        return f"{'!' if self.invert else ''}{self.dim}:{self.value}"


@dataclass(frozen=True)
class SetCut:
    dim: str
    values: tuple[str, ...]
    invert: bool = False

    def to_string(self) -> str:
        return f"{'!' if self.invert else ''}{self.dim}:{';'.join(self.values)}"


@dataclass(frozen=True)
class RangeCut:
    dim: str
    lo: str | None
    hi: str | None
    invert: bool = False

    def to_string(self) -> str:
        return (f"{'!' if self.invert else ''}{self.dim}:"
                f"{self.lo or ''}~{self.hi or ''}")


Cut = PointCut | SetCut | RangeCut


def parse_cut(token: str) -> Cut:
    """Parse one ``[!]dim:spec`` token."""
    invert = token.startswith("!")
    if invert:
        token = token[1:]
    if ":" not in token:
        raise CutParseError(f"cut missing ':' separator: {token!r}")
    dim, spec = token.split(":", 1)
    if not dim:
        raise CutParseError(f"cut missing dimension: {token!r}")
    if "~" in spec:
        lo, hi = spec.split("~", 1)
        if "~" in hi:
            raise CutParseError(f"range cut has >1 '~': {token!r}")
        if not lo and not hi:
            raise CutParseError(f"range cut needs at least one bound: {token!r}")
        return RangeCut(dim, lo or None, hi or None, invert)
    if ";" in spec:
        values = tuple(v for v in spec.split(";") if v != "")
        if not values:
            raise CutParseError(f"empty set cut: {token!r}")
        return SetCut(dim, values, invert)
    return PointCut(dim, spec, invert)


def parse_cuts(param: str | None) -> list[Cut]:
    """Parse a full ``cut=`` parameter (``|``-separated, ANDed)."""
    if not param:
        return []
    return [parse_cut(tok) for tok in param.split("|") if tok]


def cuts_to_string(cuts: list[Cut]) -> str:
    return "|".join(c.to_string() for c in cuts)


def _is_intlike(s: str) -> bool:
    try:
        int(s)
        return True
    except ValueError:
        return False


def cut_to_column(cut: Cut) -> Column:
    """Compile one cut to a Column predicate.

    Point/set comparison is exact and case-sensitive (HOWTO.md:101-103).
    Range cuts on integer-looking bounds compare numerically (the reference's
    ``period`` is a string year range-cut numerically, HOWTO.md:77-79); other
    ranges compare as strings.
    """
    col = F.col(cut.dim)
    if isinstance(cut, PointCut):
        pred = col == F.lit(cut.value)
    elif isinstance(cut, SetCut):
        pred = col.isin(list(cut.values))
    else:  # RangeCut
        numeric = all(_is_intlike(b) for b in (cut.lo, cut.hi) if b is not None)
        c = col.cast("long") if numeric else col
        lo = F.lit(int(cut.lo) if numeric else cut.lo) if cut.lo is not None else None
        hi = F.lit(int(cut.hi) if numeric else cut.hi) if cut.hi is not None else None
        if lo is not None and hi is not None:
            pred = (c >= lo) & (c <= hi)
        elif lo is not None:
            pred = c >= lo
        else:
            pred = c <= hi
    return ~pred if cut.invert else pred


def cuts_to_predicate(cuts: list[Cut]) -> Column | None:
    """AND-combine all cuts; None when there are no cuts."""
    pred: Column | None = None
    for cut in cuts:
        c = cut_to_column(cut)
        pred = c if pred is None else (pred & c)
    return pred
