"""Predicate builders and tenant isolation — the reference's filter
family (P1-P5, P7).

- ``build_filter`` is the Qdrant-style filter builder (P2,
  src/storage/vector_store.py:275-305): a dict compiles to an ANDed
  Column — equality, IN-list (``MatchAny``), and {gte,lte,gt,lt} ranges.
- ``TenantContext`` mirrors the reference's mandatory tenant conjunct
  (P3, src/metadata/tenant_schema.py:61-74, 201-218): organization_id
  equality always, optional workspace/collection equality, optional
  access-level IN — injected into every query by the engine wrapper,
  exactly as src/api/main.py:407-410 merges it into user filters.
- ``json_filter`` is the JSONB containment filter (P5,
  src/storage/metadata_store.py:1228-1242) over a JSON-string column.

All of these are plain Column predicates, so Catalyst pushes them into
the Parquet scan (partition pruning when the column is a partition key —
the 100 TB layout partitions every table by organization_id).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def build_filter(spec: dict) -> Column:
    """P2: dict → ANDed predicate.

    value forms: scalar → ``==``; list/tuple → ``isin``; dict with any of
    gte/lte/gt/lt → range. Unknown range keys raise.
    """
    pred = F.lit(True)
    for key, val in spec.items():
        col = F.col(key)
        if isinstance(val, dict):
            ops = {"gte": col.__ge__, "lte": col.__le__,
                   "gt": col.__gt__, "lt": col.__lt__}
            unknown = set(val) - set(ops)
            if unknown:
                raise ValueError(f"unsupported range ops {unknown} for {key}")
            for op, bound in val.items():
                pred = pred & ops[op](F.lit(bound))
        elif isinstance(val, (list, tuple)):
            pred = pred & col.isin(*val)
        else:
            pred = pred & (col == F.lit(val))
    return pred


@dataclass(frozen=True)
class TenantContext:
    """P3 (tenant_schema.py:10-15, 61-74): Organization → Workspace →
    Collection hierarchy; org is mandatory, the rest optional."""

    organization_id: str
    workspace_id: str | None = None
    collection_id: str | None = None
    access_levels: tuple[str, ...] = ()

    def to_filter_dict(self) -> dict:
        spec: dict = {"organization_id": self.organization_id}
        if self.workspace_id is not None:
            spec["workspace_id"] = self.workspace_id
        if self.collection_id is not None:
            spec["collection_id"] = self.collection_id
        if self.access_levels:
            spec["access_level"] = list(self.access_levels)
        return spec

    def predicate(self, user_filters: dict | None = None) -> Column:
        """The merged conjunct every query must carry
        (api/main.py:407-410: tenant dict ∪ user dict, tenant wins)."""
        merged = dict(user_filters or {})
        merged.update(self.to_filter_dict())
        return build_filter(merged)


def scoped(df: DataFrame, ctx: TenantContext,
           user_filters: dict | None = None) -> DataFrame:
    """Apply the tenant conjunct + user filters to any table."""
    return df.filter(ctx.predicate(user_filters))


def json_filter(json_col: Column, key: str) -> Column:
    """P5: extract ``$.key`` from a JSON-string column (the reference's
    JSONB ``metadata @> {k: v}``); compare/cast at the call site."""
    return F.get_json_object(json_col, f"$.{key}")


# ---------------------------------------------------------------------------
# Tenant derivation for the driver's tenant-less test tables: a
# deterministic projection (doc_id-keyed) that stands in for the tenant
# columns the real ingest path would carry. Shared with the oracle SQL.
# ---------------------------------------------------------------------------

N_ORGS = 4
N_WORKSPACES = 2
ACCESS_LEVELS = ("public", "internal", "restricted")


def derive_tenant(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach organization_id / workspace_id / access_level columns,
    deterministically keyed on the id column."""
    did = F.col(id_col)
    return docs.withColumns(
        {
            "organization_id": F.concat(F.lit("org"), (did % N_ORGS).cast("string")),
            "workspace_id": F.concat(F.lit("ws"), (did % N_WORKSPACES).cast("string")),
            "access_level": F.element_at(
                F.array(*[F.lit(a) for a in ACCESS_LEVELS]),
                (did % len(ACCESS_LEVELS) + 1).cast("int"),
            ),
        }
    )


def derive_tenant_sql(id_col: str = "doc_id") -> str:
    """DuckDB expression list matching ``derive_tenant`` exactly."""
    levels = ", ".join(f"'{a}'" for a in ACCESS_LEVELS)
    return (
        f"'org' || ({id_col} % {N_ORGS})::VARCHAR AS organization_id, "
        f"'ws' || ({id_col} % {N_WORKSPACES})::VARCHAR AS workspace_id, "
        f"[{levels}][({id_col} % {len(ACCESS_LEVELS)}) + 1] AS access_level"
    )
