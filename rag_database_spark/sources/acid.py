"""Merge-on-read mutable table over plain Parquet — the engine's
``DELETE WHERE`` / delete-first re-ingest story (S12/S13) when no
Delta/Iceberg runtime is present.

The reference mutates per-document state with SQL DELETEs
(src/storage/metadata_store.py:770-847: delete_document + the
delete-then-insert upsert). A 100 TB Spark table can't rewrite data
files per delete; the lakehouse answer is merge-on-read: immutable
base files plus a small tombstone set, applied at read time and folded
in by occasional compaction (the same topology as Delta deletion
vectors / Iceberg positional+equality deletes — public designs).

Layout under ``root``:

    base/…parquet        append-only data files, each row stamped with
                         its ``_commit`` epoch
    tombstones/…parquet  (key, up_to) — "delete rows of this key whose
                         _commit ≤ up_to"
    _epoch               single-writer monotonic commit counter

Scoping tombstones by epoch is what makes delete-then-reinsert
correct: an upsert tombstones the key AS OF the current epoch, then
appends the replacement at a LATER epoch, so the new row survives the
read-side filter. (A bare key tombstone would delete the replacement
too — the classic merge-on-read trap; Iceberg equality deletes carry a
sequence number for exactly this reason.)

Scale properties:
- ``append`` writes only the new rows (no read-modify-write).
- ``delete_where`` scans with the predicate PUSHED DOWN, writes only
  the matching keys. Cost ∝ matches, not table size.
- ``read`` joins base against the (tiny between compactions) tombstone
  aggregate → Spark broadcasts it; the scan stays shuffle-free.
- ``compact`` rewrites base minus tombstones once, amortizing N
  deletes into one rewrite.

Writers are single-owner (the reference's ingest is too); multi-writer
commit coordination is exactly the part a real Delta/Iceberg runtime
would replace, seam-style.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

COMMIT_COL = "_commit"

#: Explicit staging-complete proof written by ``compact()`` after the
#: staging write RETURNS (same contract as
#: ``operators.dedup.STAGING_SENTINEL`` — kept in sync by name). The
#: committer's ``_SUCCESS`` stays accepted as a fallback for
#: pre-sentinel residue, but "any parquet file exists" alone is NOT
#: completeness: a crash mid-job-commit leaves some part-files, and a
#: roll-forward on that evidence would permanently serve a partial
#: base.
STAGING_SENTINEL = "_STAGING_COMPLETE"


class TombstoneTable:
    """A keyed, append+delete Parquet table with merge-on-read."""

    def __init__(self, spark: SparkSession, root: str, key_col: str) -> None:
        self.spark = spark
        self.root = Path(root)
        self.key_col = key_col
        self.base_dir = self.root / "base"
        self.tomb_dir = self.root / "tombstones"
        self.epoch_file = self.root / "_epoch"

    # -- commit epochs -----------------------------------------------------

    def _current_epoch(self) -> int:
        if self.epoch_file.exists():
            return int(self.epoch_file.read_text())
        return 0

    def _bump_epoch(self) -> int:
        nxt = self._current_epoch() + 1
        self.root.mkdir(parents=True, exist_ok=True)
        self.epoch_file.write_text(str(nxt))
        return nxt

    # -- helpers -----------------------------------------------------------

    def _has(self, d: Path) -> bool:
        return d.exists() and any(d.glob("*.parquet"))

    def _recover(self) -> None:
        """Heal a table left half-swapped by a crash inside
        ``compact()``. The swap sequence is base→base_old,
        base_staging→base, rm base_old, rm tombstones; a crash between
        the renames leaves no ``base/`` at all. Single-writer, so the
        residue dirs unambiguously identify the interrupted step:

        - base missing + COMPLETE staging (``STAGING_SENTINEL``, or
          the committer's ``_SUCCESS`` for pre-sentinel residue) →
          roll FORWARD (finish the swap).
        - base missing + only base_old (or an INCOMPLETE staging —
          part-files without a completeness proof) → roll BACK to the
          old base (tombstones still apply) and clear the residue.
        - base present + base_old left over → finish cleanup.

        Folded-away tombstones are cleared on roll-forward; they would
        be harmless no-ops anyway (survivors are re-stamped at the
        compaction epoch, above every tombstone's ``up_to``)."""
        staging = self.root / "base_staging"
        old = self.root / "base_old"
        complete = (staging / STAGING_SENTINEL).exists() or (
            staging / "_SUCCESS"
        ).exists()
        if not self._has(self.base_dir):
            if self._has(staging) and complete:
                if self.base_dir.exists():
                    shutil.rmtree(self.base_dir)
                staging.rename(self.base_dir)
                (self.base_dir / STAGING_SENTINEL).unlink(missing_ok=True)
                if old.exists():
                    shutil.rmtree(old)
                if self.tomb_dir.exists():
                    shutil.rmtree(self.tomb_dir)
            elif self._has(old):
                if self.base_dir.exists():
                    shutil.rmtree(self.base_dir)
                old.rename(self.base_dir)
                if staging.exists():
                    shutil.rmtree(staging)
        elif old.exists():
            shutil.rmtree(old)

    def _base(self) -> DataFrame | None:
        self._recover()
        if not self._has(self.base_dir):
            return None
        return self.spark.read.parquet(str(self.base_dir))

    def _tombstones(self) -> DataFrame | None:
        if not self._has(self.tomb_dir):
            return None
        return self.spark.read.parquet(str(self.tomb_dir))

    # -- writes ------------------------------------------------------------

    def append(self, df: DataFrame) -> None:
        """Append-only data write stamped with the next commit epoch;
        never touches existing files. Incoming columns must match the
        base schema exactly (order-insensitive) — mixed-schema parquet
        under one directory would make the read-time schema depend on
        which file Spark samples."""
        base = self._base()
        if base is not None:
            base_cols = [c for c in base.columns if c != COMMIT_COL]
            if sorted(df.columns) != sorted(base_cols):
                raise ValueError(
                    f"append schema mismatch at {self.root}: table has "
                    f"{sorted(base_cols)}, incoming has {sorted(df.columns)}"
                )
            df = df.select(*base_cols)
        epoch = self._bump_epoch()
        df.withColumn(COMMIT_COL, F.lit(epoch)).write.mode(
            "append"
        ).parquet(str(self.base_dir))

    def delete_where(self, predicate: Column | str) -> int:
        """DELETE WHERE: tombstone the matching keys (from the CURRENT
        visible view, so already-deleted rows don't re-tombstone) as of
        the current epoch. Returns the number of newly deleted keys.
        The predicate is pushed into the Parquet scan."""
        if isinstance(predicate, str):
            predicate = F.expr(predicate)
        doomed = (
            self.read().filter(predicate).select(self.key_col).distinct()
        )
        n = doomed.count()
        if n:
            self._write_tombstones(doomed)
        return n

    def delete_keys(self, keys: DataFrame) -> None:
        """Delete by explicit key frame (S13 cascade building block)."""
        self._write_tombstones(
            keys.select(F.col(keys.columns[0]).alias(self.key_col)).distinct()
        )

    def _write_tombstones(self, keys: DataFrame) -> None:
        # a delete is a commit of its own: stamping tombstones with a
        # FRESH epoch (a) keeps snapshots unambiguous — the state at
        # epoch E never depends on whether a later delete ran — and
        # (b) still precedes any replacement rows, which `append` will
        # stamp at a later epoch still
        epoch = self._bump_epoch()
        keys.withColumn("up_to", F.lit(epoch)).write.mode("append").parquet(
            str(self.tomb_dir)
        )

    def upsert(self, df: DataFrame) -> None:
        """Delete-first re-ingest (metadata_store.py:799-847 semantics):
        tombstone every incoming key as of the current epoch, then
        append the replacements at the next epoch — idempotent under
        replay, no base-file rewrite, and the replacements survive the
        read filter because their ``_commit`` exceeds the tombstone's
        ``up_to``."""
        self.delete_keys(df.select(self.key_col))
        self.append(df)

    # -- reads -------------------------------------------------------------

    def read(self, as_of_epoch: int | None = None) -> DataFrame:
        """Current view: drop rows whose commit epoch is covered by a
        tombstone for their key. The tombstone aggregate is small
        between compactions → broadcast, shuffle-free scan.

        ``as_of_epoch`` gives a SNAPSHOT read (time travel): only data
        committed at or before that epoch, with only the tombstones
        that existed then (a tombstone's ``up_to`` IS its commit
        epoch). Both snapshot filters push into the Parquet scans.
        History extends back to the last ``compact()`` — compaction
        re-stamps survivors and discards tombstones, truncating the
        travel horizon exactly like Delta/Iceberg snapshot expiry."""
        base = self._base()
        if base is None:
            raise FileNotFoundError(f"empty table at {self.root}")
        tombs = self._tombstones()
        if as_of_epoch is not None:
            base = base.filter(F.col(COMMIT_COL) <= as_of_epoch)
            if tombs is not None:
                tombs = tombs.filter(F.col("up_to") <= as_of_epoch)
        if tombs is None:
            return base.drop(COMMIT_COL)
        cutoff = tombs.groupBy(self.key_col).agg(
            F.max("up_to").alias("__up_to")
        )
        return (
            base.join(F.broadcast(cutoff), self.key_col, "left")
            .filter(
                F.col("__up_to").isNull()
                | (F.col(COMMIT_COL) > F.col("__up_to"))
            )
            .drop("__up_to", COMMIT_COL)
        )

    def tombstone_count(self) -> int:
        tombs = self._tombstones()
        if tombs is None:
            return 0
        return tombs.select(self.key_col).distinct().count()

    # -- maintenance -------------------------------------------------------

    def compact(self) -> None:
        """Fold tombstones into the base: one rewrite of the surviving
        rows (re-stamped at the compaction epoch), then clear the
        tombstone set. The new base is fully written to a staging dir
        before the swap; a crash between the two renames (or before
        cleanup) leaves residue dirs that ``_recover()`` heals on the
        next open — roll-forward when staging is complete, roll-back
        to ``base_old`` otherwise. Single-writer, best-effort on a
        non-atomic filesystem."""
        epoch = self._bump_epoch()
        survivors = self.read().withColumn(COMMIT_COL, F.lit(epoch))
        staging = self.root / "base_staging"
        if staging.exists():
            shutil.rmtree(staging)
        survivors.write.mode("overwrite").parquet(str(staging))
        # completeness proof for _recover(), independent of the
        # committer's marksuccessfuljobs setting — written only after
        # the staging write returned
        (staging / STAGING_SENTINEL).touch()
        old = self.root / "base_old"
        if old.exists():
            shutil.rmtree(old)
        self.base_dir.rename(old)
        staging.rename(self.base_dir)
        shutil.rmtree(old)
        (self.base_dir / STAGING_SENTINEL).unlink(missing_ok=True)
        if self.tomb_dir.exists():
            shutil.rmtree(self.tomb_dir)
