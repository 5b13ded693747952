"""Schema contracts: classify a schema change as additive, narrowing,
or breaking before a write is allowed to evolve a table.

Operational companion to the txnlog's schema-evolution support
(operators/txnlog.py) and the reference's implicit "overwrite whatever
the frame looks like" posture (`mysql_silver_transformation.py` carries
no schema governance at all): at 100 TB a silently-dropped or
re-typed column is a day of recompute, so the check runs driver-side
on STRUCTTYPES (no data scan) and the caller gates the write on the
verdict.

Classification per field (same lattice Delta/Iceberg evolution rules
use):

- ``added``      — new column; compatible iff nullable
- ``removed``    — breaking (readers lose a column)
- ``widened``    — int→long, float→double, int→double, date→timestamp:
  compatible (every old value representable)
- ``narrowed``   — the reverse direction: breaking
- ``retyped``    — any other type change: breaking
- ``tightened``  — nullable→required on an existing column: breaking
  (old rows may hold nulls)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.types import StructType

_WIDENINGS = {
    ("integer", "long"),
    ("integer", "double"),
    ("long", "double"),
    ("float", "double"),
    ("short", "integer"),
    ("short", "long"),
    ("byte", "short"),
    ("byte", "integer"),
    ("byte", "long"),
    ("date", "timestamp"),
}


@dataclass
class SchemaDiff:
    added: list[str] = field(default_factory=list)
    added_required: list[str] = field(default_factory=list)
    removed: list[str] = field(default_factory=list)
    widened: list[tuple[str, str, str]] = field(default_factory=list)
    narrowed: list[tuple[str, str, str]] = field(default_factory=list)
    retyped: list[tuple[str, str, str]] = field(default_factory=list)
    tightened: list[str] = field(default_factory=list)

    @property
    def breaking(self) -> list[str]:
        return (
            [f"removed:{c}" for c in self.removed]
            + [f"added-required:{c}" for c in self.added_required]
            + [f"narrowed:{c}({a}->{b})" for c, a, b in self.narrowed]
            + [f"retyped:{c}({a}->{b})" for c, a, b in self.retyped]
            + [f"tightened:{c}" for c in self.tightened]
        )

    @property
    def compatible(self) -> bool:
        return not self.breaking


def diff_schemas(old: StructType, new: StructType) -> SchemaDiff:
    """Field-by-field classification of ``old`` → ``new`` (names are
    case-sensitive, order-insensitive — column order is not part of the
    contract, matching parquet-by-name resolution)."""
    d = SchemaDiff()
    old_f = {f.name: f for f in old.fields}
    new_f = {f.name: f for f in new.fields}
    for name in new_f:
        if name not in old_f:
            (d.added if new_f[name].nullable else d.added_required).append(
                name
            )
    for name in old_f:
        if name not in new_f:
            d.removed.append(name)
            continue
        o, n = old_f[name], new_f[name]
        ot, nt = o.dataType.typeName(), n.dataType.typeName()
        if ot != nt:
            if (ot, nt) in _WIDENINGS:
                d.widened.append((name, ot, nt))
            elif (nt, ot) in _WIDENINGS:
                d.narrowed.append((name, ot, nt))
            else:
                d.retyped.append((name, ot, nt))
        if o.nullable and not n.nullable:
            d.tightened.append(name)
    return d


def enforce_contract(old: StructType, new: StructType) -> SchemaDiff:
    """Raise ``ValueError`` (listing every violation) when the change
    is breaking; return the diff otherwise. The intended call site is
    immediately before a table overwrite/evolution."""
    d = diff_schemas(old, new)
    if not d.compatible:
        raise ValueError(
            "breaking schema change: " + "; ".join(d.breaking)
        )
    return d
