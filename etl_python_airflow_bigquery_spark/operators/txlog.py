"""Manifest-based transactional table — the Delta-core protocol on plain
parquet (ROADMAP #3: "transactional MERGE if a Delta-equivalent becomes
available"; none is installable here, so the engine carries the minimal
correct protocol itself).

The reference mutates BigQuery tables, which gives it snapshot-isolated
readers and atomic MERGE for free (funnel_live.py:153-174,
consumo_detalle.py:317-340). Plain parquet directories have neither:
`merge_upsert`'s directory rename-swap is atomic on POSIX but (a) leaves a
window where a table LISTING races the swap on object stores that fake
renames with copy+delete, and (b) supports no time travel. The txlog fixes
both with the trick every modern table format uses:

* data files are IMMUTABLE, uuid-named, only ever ADDED under ``data/``;
* a table STATE is a manifest (``_txlog/v{N}.json``) listing exactly the
  data files of that version — never a directory listing;
* a commit writes its data files first, then claims version N+1 by
  atomically LINKING a fully-written temp manifest to ``v{N+1}.json``
  (`os.link` fails with EEXIST if a concurrent writer won — optimistic
  concurrency, loser raises, nothing is corrupted);
* readers resolve max(N) once and read only that manifest's files — a
  reader mid-scan keeps its snapshot regardless of later commits, and a
  crashed writer leaves only invisible orphan files.

At 100 TB the manifest is the only metadata hot spot (KBs per commit);
data moves are zero — exactly why this layout is object-store-safe where
rename-swaps are not. Orphan cleanup (`vacuum`) uses the manifests as the
root set, mirroring Delta's VACUUM.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

import pyarrow.parquet as _pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


# Exact-tile-border cardinality cap for optimize_zorder: up to this many
# distinct values per z column, tile borders compute from the exact
# per-value histogram (deterministic — a pure function of the data
# multiset); past it, approxQuantile (deterministic per physical
# layout only). 256k (value, count) rows ≈ 4 MB on the driver.
_Z_DISTINCT_CAP = 262_144

# bucket-to-partition inverse-hash keys, cached per partition count —
# the probe job is tiny (one range scan) and its answer is a pure
# function of Spark's fixed Murmur3, so it never goes stale
_INV_HASH_KEYS: dict[int, list[int]] = {}


def _inverse_hash_keys(spark: SparkSession, n: int) -> list[int]:
    """For each target partition b < n, the smallest bigint k with
    pmod(murmur3(k), n) == b — the key that makes
    ``repartition(n, key)`` route a row EXACTLY to partition b.
    DataFrame hash partitioning is pmod(Murmur3Hash(cols), n), so this
    turns content-hash partitioning into a deterministic, sample-free
    assignment of one z-order bucket per output file
    (``optimize_zorder``). Computed with one tiny Spark job against the
    engine's own ``hash`` (bit-identical to the partitioner's) and
    cached per ``n``."""
    if n in _INV_HASH_KEYS:
        return _INV_HASH_KEYS[n]
    claves: dict[int, int] = {}
    lo = 0
    while len(claves) < n:
        filas = (
            spark.range(lo, lo + max(64, 16 * n))
            .select("id", F.pmod(F.hash("id"), F.lit(n)).alias("p"))
            .collect()
        )
        for r in sorted(filas, key=lambda r: r["id"]):
            claves.setdefault(int(r["p"]), int(r["id"]))
        lo += max(64, 16 * n)
    _INV_HASH_KEYS[n] = [claves[b] for b in range(n)]
    return _INV_HASH_KEYS[n]


class CommitConflict(RuntimeError):
    """Another writer claimed the version first; retry on fresh state."""


class ConstraintViolation(RuntimeError):
    """An incoming batch (or the existing data, for add_constraint)
    breaks a CHECK constraint — the commit is refused, nothing flips."""


class NonIncrementalHistory(RuntimeError):
    """changes() crossed a version that rewrote data (merge /
    replace_where / overwrite of a non-empty table): a file-level diff
    cannot express row-level deltas there — re-read the snapshot."""


class TxTable:
    """``stats_cols`` opts into Delta-style PER-FILE min/max stats in the
    manifest (read once from each new file's parquet footer at commit
    time — no extra scan): `read_where` then prunes whole files the
    predicate cannot touch, and `replace_where` rewrites ONLY files
    whose stats overlap the replaced range — the transactional K3 whose
    cost is bounded by the touched window, not the table."""

    def __init__(
        self,
        path: str,
        stats_cols: list[str] | None = None,
        bloom_cols: list[str] | None = None,
        bloom_bits: int = 4096,
        bloom_hashes: int = 3,
    ) -> None:
        self.path = path
        self.stats_cols = stats_cols or []
        # bloom_cols opts into PER-FILE Bloom filters in the manifest:
        # min/max stats prune RANGES but are useless for point lookups
        # on high-cardinality keys (every file's [min, max] contains
        # almost every id) — the Bloom bitset answers "definitely not
        # in this file" for equality probes instead, the data-skipping
        # index Delta/Iceberg attach for the same reason. 4096 bits / 3
        # hashes ≈ 1% false positives at ~500 distinct values per file;
        # 512 manifest bytes per file per column.
        self.bloom_cols = bloom_cols or []
        self.bloom_bits = bloom_bits
        self.bloom_hashes = bloom_hashes
        self.log_dir = os.path.join(path, "_txlog")
        self.data_dir = os.path.join(path, "data")
        os.makedirs(self.log_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)

    # -- state ------------------------------------------------------------
    def _versions(self) -> list[int]:
        out = []
        for f in os.listdir(self.log_dir):
            if f.startswith("v") and f.endswith(".json"):
                try:
                    out.append(int(f[1:-5]))
                except ValueError:
                    continue
        return sorted(out)

    def version(self) -> int:
        """Latest committed version; -1 for an empty table."""
        vs = self._versions()
        return vs[-1] if vs else -1

    def _manifest(self, v: int) -> dict:
        with open(os.path.join(self.log_dir, f"v{v}.json")) as fh:
            return json.load(fh)

    # -- read -------------------------------------------------------------
    @staticmethod
    def _names(entries: list) -> list[str]:
        return [e["name"] if isinstance(e, dict) else e for e in entries]

    def _read_entries(self, spark: SparkSession, entries: list, schema_json: str) -> DataFrame:
        schema = StructType.fromJson(json.loads(schema_json))
        if not entries:
            return spark.createDataFrame([], schema)
        # the MANIFEST's schema governs the scan — without it a multi-file
        # snapshot whose appends drifted would silently adopt whichever
        # file the reader samples first (missing columns read as NULL,
        # extra columns are dropped — deterministic either way)
        return spark.read.schema(schema).parquet(
            *[os.path.join(self.data_dir, n) for n in self._names(entries)]
        )

    def history(self, spark: SparkSession) -> DataFrame:
        """DESCRIBE HISTORY: one row per surviving version manifest —
        (version, parent, op, n_files, restored_from) — newest first.
        The ops-auditing face of the log (what rewrote the table, when a
        restore happened, which versions vacuum already dropped show as
        gaps); O(#versions) driver work reading manifests, no data files
        touched."""
        rows = []
        for v in sorted(self._versions(), reverse=True):
            m = self._manifest(v)
            rows.append(
                (
                    v,
                    m.get("parent", v - 1),
                    m.get("op", "?"),
                    len(m.get("files", [])),
                    m.get("restored_from"),
                )
            )
        return spark.createDataFrame(
            rows,
            "version BIGINT, parent BIGINT, op STRING, n_files BIGINT, "
            "restored_from BIGINT",
        )

    def read_asof(self, spark: SparkSession, ts: float) -> DataFrame:
        """Delta-style ``TIMESTAMP AS OF``: read the latest version
        whose commit instant is ≤ ``ts`` (epoch seconds). Resolution is
        a manifest walk (KB of metadata); versions predating the
        ``committed_at`` field (or vacuumed away) are skipped. The
        version number remains the ordering authority — the timestamp
        is a convenience lookup over it, exactly as in Delta, so a
        clock that stepped backwards between commits resolves to the
        LATEST qualifying version, never an earlier one."""
        best = -1
        for v in self._versions():
            at = self._manifest(v).get("committed_at")
            if at is not None and at <= ts and v > best:
                best = v
        if best < 0:
            raise FileNotFoundError(
                f"txlog table {self.path!r} has no version committed at "
                f"or before {ts}"
            )
        return self.read(spark, version=best)

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Snapshot read: the file set comes from ONE manifest (pinned if
        ``version`` is given — time travel), never a directory listing,
        so concurrent commits and orphan files are invisible."""
        v = self.version() if version is None else version
        if v < 0:
            raise FileNotFoundError(f"txlog table {self.path!r} has no commits")
        m = self._manifest(v)
        return self._read_entries(spark, m["files"], m["schema"])

    @staticmethod
    def _overlaps(entry, col: str, lo, hi) -> bool:
        """True unless the file's recorded stats PROVE [lo, hi] misses it
        (no stats ⇒ must read — skipping is only ever an optimization)."""
        stats = entry.get("stats", {}) if isinstance(entry, dict) else {}
        if col not in stats or stats[col] is None:
            return True
        mn, mx = stats[col]
        try:
            return not (mx < lo or mn > hi)
        except TypeError:
            # stats and bounds of incomparable types (e.g. a stats_col
            # whose type changed between appends) — must read
            return True

    def read_where(self, spark: SparkSession, col: str, lo, hi) -> DataFrame:
        """Stats-pruned snapshot read of ``lo <= col <= hi``: whole files
        whose min/max cannot intersect the range never reach the scan —
        manifest-level file skipping on top of parquet's own row-group
        skipping. Exact: the residual filter still applies per row."""
        m = self._manifest(self.version())
        hits = [e for e in m["files"] if self._overlaps(e, col, lo, hi)]
        df = self._read_entries(spark, hits, m["schema"])
        return df.where(F.col(col).between(lo, hi))

    def read_in(
        self, spark: SparkSession, col: str, values, version: int | None = None
    ) -> DataFrame:
        """Stats-pruned snapshot read of ``col IN values`` — the
        SET-membership sibling of ``read_where``, built for serve paths
        whose qualifying keys are known and BOUNDED (the ANN probe: the
        distinct probed cells of a query batch, ≤ k ids): a file is
        scanned only when its recorded min/max admits at least one of
        the values, so a range-clustered table (optimize_compact's
        cluster_col) serves a probe from the few files covering its
        cells. Exact: the residual IN filter still applies per row; a
        file without stats is always read. The membership test is
        O(files × log values) — a bisect over the sorted value list per
        file (admit iff the smallest value ≥ min is ≤ max: identical
        verdict to probing every value against the range) — and the
        residual filter is ONE parsed IN expression (``in_literals``),
        not a per-value py4j literal (r14: a 20k-value ``isin`` spent
        ~15 s constructing literals on the driver)."""
        import bisect

        from etl_python_airflow_bigquery_spark.functions import in_literals

        v = self.version() if version is None else version
        if v < 0:
            raise FileNotFoundError(f"txlog table {self.path!r} has no commits")
        m = self._manifest(v)
        vals = sorted(set(values))
        if not vals:
            return self._read_entries(spark, [], m["schema"])

        def admite(e) -> bool:
            stats = e.get("stats", {}) if isinstance(e, dict) else {}
            if col not in stats or stats[col] is None:
                return True
            mn, mx = stats[col]
            try:
                i = bisect.bisect_left(vals, mn)
                return i < len(vals) and not (vals[i] > mx)
            except TypeError:
                return True  # incomparable types — must read

        hits = [e for e in m["files"] if admite(e)]
        df = self._read_entries(spark, hits, m["schema"])
        return df.where(in_literals(col, vals))

    # -- write ------------------------------------------------------------
    def _write_files(self, df: DataFrame) -> list[dict]:
        """Materialize df as immutable uuid-named parquet files in data/,
        harvesting per-file min/max for ``stats_cols`` from the footers
        just written (row-group stats roll up; no data re-read). Files
        become VISIBLE only when a manifest referencing them lands."""
        tmp = os.path.join(self.path, f"_stage_{uuid.uuid4().hex[:8]}")
        df.write.parquet(tmp)
        out = []
        for f in os.listdir(tmp):
            if not f.endswith(".parquet"):
                continue
            src = os.path.join(tmp, f)
            stats = self._footer_stats(src) if self.stats_cols else {}
            nulls = self._footer_nulls(src) if self.stats_cols else {}
            blooms = self._file_blooms(src) if self.bloom_cols else {}
            name = f"part-{uuid.uuid4().hex}.parquet"
            os.rename(src, os.path.join(self.data_dir, name))
            entry = {"name": name, "stats": stats}
            if nulls:
                entry["nulls"] = nulls
            if blooms:
                entry["blooms"] = blooms
            out.append(entry)
        shutil.rmtree(tmp)
        return out

    # -- bloom index -------------------------------------------------------
    def _bloom_positions(self, value) -> list[int]:
        """The k deterministic bit positions of a value: md5 of the
        value's canonical string per hash seed — stable across runs,
        engines, and Python hash randomization."""
        import hashlib

        return [
            int.from_bytes(
                hashlib.md5(f"{value}#{j}".encode()).digest()[:8], "big"
            )
            % self.bloom_bits
            for j in range(self.bloom_hashes)
        ]

    @staticmethod
    def _bloomable(value) -> bool:
        """Same discipline as `_footer_stats`' type whitelist: Bloom
        bits are built (and probed) only for int/str values, whose
        canonical ``str()`` is unambiguous — a DOUBLE column's 7.0
        would hash differently from an int probe's 7, turning the
        'definitely absent' answer into silent row loss."""
        return isinstance(value, (int, str)) and not isinstance(value, bool)

    def _file_blooms(self, path: str) -> dict:
        """Build the per-column Bloom bitsets for a just-written file
        (one column-pruned pyarrow read of that file — at production
        scale the same bits are folded in during the write itself).
        Encoded as hex of the bitset bytes for the JSON manifest.
        Columns missing from the file or of non-int/str types degrade
        to None = never skipped (the `_footer_stats` contract)."""
        present = set(_pq.ParquetFile(path).schema_arrow.names)
        cols = [c for c in self.bloom_cols if c in present]
        table = _pq.read_table(path, columns=cols) if cols else None
        out = {}
        for c in self.bloom_cols:
            if c not in present:
                out[c] = None
                continue
            bits = bytearray(self.bloom_bits // 8)
            ok = True
            for v in table.column(c):
                v = v.as_py()
                if v is None:
                    continue
                if not self._bloomable(v):
                    ok = False
                    break
                for pos in self._bloom_positions(v):
                    bits[pos // 8] |= 1 << (pos % 8)
            out[c] = bytes(bits).hex() if ok else None
        return out

    def _bloom_may_contain(self, entry, col: str, value) -> bool:
        """False only when the file's Bloom filter PROVES the value
        absent; no filter — or a probe value outside the int/str
        canonical domain — ⇒ must read (skipping stays an
        optimization)."""
        if not self._bloomable(value):
            return True
        blooms = entry.get("blooms", {}) if isinstance(entry, dict) else {}
        encoded = blooms.get(col)
        if not encoded:
            return True
        bits = bytes.fromhex(encoded)
        return all(
            bits[pos // 8] & (1 << (pos % 8))
            for pos in self._bloom_positions(value)
        )

    def _may_hold_range(self, entry, col: str, lo, hi) -> bool:
        """Stats check, plus the Bloom check when the range is a POINT
        (lo == hi): a file whose filter proves the value absent holds
        nothing to delete or read in that window."""
        if not self._overlaps(entry, col, lo, hi):
            return False
        if lo == hi and not self._bloom_may_contain(entry, col, lo):
            return False
        return True

    def read_point(self, spark: SparkSession, col: str, value) -> DataFrame:
        """Point lookup ``col = value`` with Bloom + stats file
        skipping: a file is read only if its min/max admits the value
        AND its Bloom filter cannot rule it out. Exact — the residual
        equality filter still applies to the surviving files' rows."""
        m = self._manifest(self.version())
        hits = [
            e
            for e in m["files"]
            if self._overlaps(e, col, value, value)
            and self._bloom_may_contain(e, col, value)
        ]
        df = self._read_entries(spark, hits, m["schema"])
        return df.where(F.col(col) == F.lit(value))

    def _footer_nulls(self, path: str) -> dict:
        """Per-file NULL counts for ``stats_cols`` (Delta's nullCount
        stat): rolls up row-group ``null_count`` from the footer just
        written. Unknown (any row group missing the stat) degrades to
        absent = never skipped. Powers IS NULL pruning in
        ``delete_matching``: a file with zero recorded NULLs provably
        has nothing for an IS-NULL predicate to delete."""
        md = _pq.ParquetFile(path).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        out: dict[str, int] = {}
        for col in self.stats_cols:
            if col not in idx:
                continue
            total = 0
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[col]).statistics
                if st is None or st.null_count is None:
                    break
                total += st.null_count
            else:
                out[col] = total
        return out

    def _footer_stats(self, path: str) -> dict:
        md = _pq.ParquetFile(path).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        out = {}
        for col in self.stats_cols:
            if col not in idx:
                out[col] = None
                continue
            mns, mxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[col]).statistics
                if st is None or not st.has_min_max:
                    break
                mns.append(st.min)
                mxs.append(st.max)
            else:
                if mns:
                    mn, mx = min(mns), max(mxs)
                    # record stats ONLY for natively-JSON-comparable types:
                    # stringifying a date/timestamp/decimal min/max would
                    # later compare str-vs-native in _overlaps (TypeError
                    # or silent mis-pruning). Unsupported types degrade to
                    # "no stats" = never skipped — always correct.
                    if (
                        type(mn) is type(mx)
                        and isinstance(mn, (int, float, str))
                        and not isinstance(mn, bool)
                    ):
                        out[col] = [mn, mx]
                        continue
            out[col] = None
        return out

    def _claim(self, manifest: dict, expected_parent: int) -> int:
        """Atomically claim version expected_parent+1: write the full
        manifest to a temp name, then hard-link it to the version file —
        link fails with EEXIST if a concurrent writer got there first
        (their data files and ours are disjoint, so losing is clean).

        The application-transaction fence (``txn``: app_id -> last
        applied version, Delta's txnAppId/txnVersion pattern) is carried
        forward from the parent manifest and merged with any entry the
        new commit contributes — so a compaction, merge, or overwrite in
        between never erases a streaming writer's idempotency marker.
        The merge is per-app ``max()``, never overwrite: fences are
        monotonic by contract, and the fence-check in append/overwrite
        and the parent read here are not one atomic step — a writer that
        read the fence before a concurrent commit could otherwise claim
        the next version carrying a LOWER fence for the same app_id,
        regressing it and reopening the double-apply window the fence
        exists to close."""
        v = expected_parent + 1
        parent_txn = (
            self._manifest(expected_parent).get("txn", {})
            if expected_parent >= 0
            else {}
        )
        txn = dict(parent_txn)
        for app_id, new_v in manifest.get("txn", {}).items():
            old_v = txn.get(app_id)
            txn[app_id] = new_v if old_v is None else max(old_v, new_v)
        payload = {
            **manifest,
            "version": v,
            "parent": expected_parent,
            # wall-clock commit instant: powers read_asof (timestamp
            # time travel). Informational only — ordering authority is
            # always the version number, never the clock.
            "committed_at": time.time(),
        }
        if txn:
            payload["txn"] = txn
        # CHECK constraints carry forward the same way: a data commit
        # inherits the parent's set verbatim; only add_constraint /
        # drop_constraint set the key explicitly (an explicit {} after
        # the last drop genuinely clears it — hence the `in` test, not
        # a truthiness merge)
        if "constraints" not in manifest and expected_parent >= 0:
            parent_cons = self._manifest(expected_parent).get("constraints", {})
            if parent_cons:
                payload["constraints"] = parent_cons
        elif not payload.get("constraints"):
            payload.pop("constraints", None)
        tmp = os.path.join(self.log_dir, f"_tmp_{uuid.uuid4().hex[:8]}.json")
        with open(tmp, "w") as fh:
            json.dump(payload, fh)
            fh.flush()
            os.fsync(fh.fileno())
        final = os.path.join(self.log_dir, f"v{v}.json")
        try:
            os.link(tmp, final)
        except FileExistsError as exc:
            raise CommitConflict(
                f"version {v} of {self.path!r} was committed concurrently"
            ) from exc
        finally:
            os.unlink(tmp)
        return v

    def _commit(self, files: list[str], op: str, df: DataFrame) -> int:
        return self._claim(
            {"files": files, "op": op, "schema": df.schema.json()},
            self.version(),
        )

    def txn_version(self, app_id: str) -> int:
        """Last version this application id recorded via ``txn=`` (-1 if
        never): the read half of the txnAppId/txnVersion idempotency
        fence. One manifest read — no data files touched."""
        v = self.version()
        if v < 0:
            return -1
        return int(self._manifest(v).get("txn", {}).get(app_id, -1))

    # -- CHECK constraints --------------------------------------------
    def constraints(self) -> dict[str, str]:
        """Active CHECK constraints: name -> SQL boolean expression.
        Stored IN the manifest so they version with the data (time
        travel shows the constraints of that era) and survive every
        maintenance rewrite via _claim's carry-forward."""
        v = self.version()
        if v < 0:
            return {}
        return dict(self._manifest(v).get("constraints", {}))

    def add_constraint(self, spark: SparkSession, name: str, expr: str) -> int:
        """Delta-style ``ALTER TABLE ADD CONSTRAINT``: the EXISTING
        snapshot is validated first (one aggregation pass — a table
        already violating the rule must not get a constraint that lies
        about it), then a manifest-only version commits the rule. From
        then on every data commit (append/overwrite/merge/replace_*)
        validates its incoming rows and REFUSES the whole commit on any
        violation — Delta CHECK semantics: the expression must evaluate
        TRUE for every row; FALSE **or NULL** is a violation (stricter
        than ANSI CHECK, which lets UNKNOWN pass — an ingest gate that
        waves nulls through is not a gate). Dropping a column an active
        constraint references is refused at enforcement time by the
        analyzer (loudly); drop the constraint first."""
        if not name.isidentifier():
            raise ValueError(f"constraint name must be an identifier: {name!r}")
        cur = self.constraints()
        if name in cur:
            raise ValueError(f"constraint {name!r} already exists")
        parent = self.version()
        if parent < 0:
            raise ValueError(
                "cannot constrain a table with no schema yet — commit "
                "first (an empty overwrite establishes the schema)"
            )
        self._enforce_one(self.read(spark, parent), name, expr, existing=True)
        m = self._manifest(parent)
        return self._claim(
            {
                "files": m["files"],
                "op": "add_constraint",
                "schema": m["schema"],
                "constraints": {**cur, name: expr},
            },
            parent,
        )

    def drop_constraint(self, name: str) -> int:
        """Remove a CHECK constraint (manifest-only version). Unknown
        names raise — a deploy that thinks it relaxed a gate must not
        silently keep enforcing it."""
        cur = self.constraints()
        if name not in cur:
            raise ValueError(f"no such constraint: {name!r}")
        parent = self.version()
        m = self._manifest(parent)
        rest = {k: v for k, v in cur.items() if k != name}
        return self._claim(
            {
                "files": m["files"],
                "op": "drop_constraint",
                "schema": m["schema"],
                "constraints": rest,
            },
            parent,
        )

    @staticmethod
    def _violation_count(df: DataFrame, expr: str):
        return F.sum(
            F.when(~F.coalesce(F.expr(expr), F.lit(False)), 1).otherwise(0)
        )

    def _enforce_one(
        self, df: DataFrame, name: str, expr: str, existing: bool = False
    ) -> None:
        bad = int(df.agg(self._violation_count(df, expr).alias("n")).first()["n"] or 0)
        if bad:
            where = "existing rows" if existing else "incoming rows"
            raise ConstraintViolation(
                f"CHECK constraint {name!r} ({expr}) fails for {bad} {where}"
            )

    def _enforce(self, df: DataFrame) -> None:
        """Validate an incoming batch against every active constraint in
        ONE aggregation pass (all violation counters in a single agg —
        the same single extra job Delta pays per constrained write)."""
        cons = self.constraints()
        if not cons:
            return
        row = df.agg(
            *[self._violation_count(df, e).alias(n) for n, e in cons.items()]
        ).first()
        bad = {n: int(row[n] or 0) for n in cons if (row[n] or 0) > 0}
        if bad:
            detail = ", ".join(
                f"{n!r} ({cons[n]}): {c} rows" for n, c in sorted(bad.items())
            )
            raise ConstraintViolation(
                f"commit refused — CHECK constraint violations: {detail}"
            )

    def overwrite(
        self,
        df: DataFrame,
        extra: dict | None = None,
        txn: tuple[str, int] | None = None,
    ) -> int:
        """K2 with snapshot isolation: old files stay on disk (prior
        versions remain readable) — only the manifest flips. ``extra``
        keys land IN the manifest, so application checkpoints (e.g. the
        upstream version an incremental refresh consumed) commit
        atomically with the data they describe.

        ``txn=(app_id, version)``: application-transaction fence. If the
        table has already recorded ``version`` (or later) for ``app_id``,
        the write is SKIPPED and the current table version returned —
        exactly-once semantics for foreachBatch replays, where a crash
        between the manifest flip and the streaming checkpoint commit
        makes the stream re-deliver an already-applied batch."""
        if txn is not None and self.txn_version(txn[0]) >= txn[1]:
            return self.version()
        self._enforce(df)
        m = {
            "files": self._write_files(df),
            "op": "overwrite",
            "schema": df.schema.json(),
        }
        if extra:
            m.update(extra)
        if txn is not None:
            m["txn"] = {txn[0]: txn[1]}
        return self._claim(m, self.version())

    def append(
        self, df: DataFrame, txn: tuple[str, int] | None = None
    ) -> int:
        """K1: new files added to the parent version's set. COLUMN
        add/remove is allowed (the manifest schema governs the scan:
        files missing a column read NULL, deterministic — pinned by
        test_read_uses_manifest_schema_after_drifted_append), but a TYPE
        change on a shared column is rejected loudly: the parquet reader
        cannot coerce a physical INT64 file under an int manifest, so
        such an append would poison every later read of the older
        files.

        RENAME-shaped evolution is also rejected loudly: an append that
        simultaneously drops column X and adds column Y of the same type
        is indistinguishable from a rename, and silently treating a
        rename as drop+add breaks ``changes()`` consumers mid-stream
        (old rows read NULL under the new name with no signal). There is
        no mapped-rename support — to rename, ``overwrite`` with the new
        schema (the change feed already flags that as NonIncremental);
        to genuinely drop one column and add an unrelated same-typed
        one, do it in two appends so the intent is unambiguous.

        ``txn=(app_id, version)``: idempotency fence — an append whose
        (app_id, version) the table has already recorded is skipped (see
        ``overwrite``); a committed append records it in the manifest so
        a foreachBatch replay after a crash never double-appends."""
        if txn is not None and self.txn_version(txn[0]) >= txn[1]:
            return self.version()
        self._enforce(df)
        parent = self.version()
        base = self._manifest(parent)["files"] if parent >= 0 else []
        self._check_append_evolution(parent, df.schema)
        new = self._write_files(df)
        m = {"files": base + new, "op": "append", "schema": df.schema.json()}
        if txn is not None:
            m["txn"] = {txn[0]: txn[1]}
        return self._claim(m, parent)

    def _check_append_evolution(self, parent: int, new_schema) -> None:
        """Append-shaped schema-evolution gate (shared by ``append`` and
        WAP ``publish``): column add/remove is legal, a TYPE change on a
        shared column or a RENAME-shaped drop+add is refused loudly —
        see ``append``'s docstring for the full contract."""
        if parent < 0:
            return
        old_types = {
            f.name: f.dataType.simpleString()
            for f in StructType.fromJson(
                json.loads(self._manifest(parent)["schema"])
            ).fields
        }
        new_types = {
            f.name: f.dataType.simpleString() for f in new_schema.fields
        }
        clash = [
            f"{n}: {old_types[n]} -> {t}"
            for n, t in new_types.items()
            if n in old_types and t != old_types[n]
        ]
        if clash:
            raise ValueError(
                f"append type drift on {self.path!r} ({'; '.join(clash)}):"
                " cast the batch or use overwrite/merge for type changes"
            )
        dropped = {n: t for n, t in old_types.items() if n not in new_types}
        added = {n: t for n, t in new_types.items() if n not in old_types}
        renames = [
            f"{d} -> {a}"
            for d, dt in dropped.items()
            for a, at in added.items()
            if dt == at
        ]
        if renames:
            raise ValueError(
                f"rename-shaped evolution on {self.path!r} "
                f"({'; '.join(renames)}): one append drops a column and "
                "adds a same-typed one — ambiguous with a rename, which "
                "would silently break changes() consumers. Use overwrite "
                "for renames, or two separate appends for an unrelated "
                "drop+add"
            )

    def merge(self, spark: SparkSession, staging: DataFrame, key_cols: list[str]) -> int:
        """K4 MERGE with real snapshot isolation: reconcile against the
        snapshot read at start; if another commit lands in between, the
        version claim CONFLICTS instead of silently losing their rows —
        the lost-update window `merge_upsert`'s lockfile only guards
        becomes impossible by construction."""
        self._enforce(staging)
        parent = self.version()
        if parent >= 0:
            target = self.read(spark, parent)
            kept = target.join(
                staging.select(*key_cols).distinct(), key_cols, "left_anti"
            )
            merged = kept.unionByName(staging)
        else:
            merged = staging
        files = self._write_files(merged)
        return self._claim(
            {"files": files, "op": "merge", "schema": merged.schema.json()},
            parent,
        )

    def merge_into(
        self,
        spark: SparkSession,
        source: DataFrame,
        key_cols: list[str],
        matched_update: dict[str, str] | None = None,
        matched_delete: str | None = None,
        insert_unmatched: bool = True,
    ) -> int:
        """Full Delta-style ``MERGE INTO`` clause semantics (the plain
        ``merge`` above is the upsert special case). For each target row
        with a key match in ``source``:

        * ``matched_delete`` (SQL condition over ``t.*`` / ``s.*``)
          true → the row is DELETED;
        * else ``matched_update`` ({target col -> SQL expr over t/s})
          → the row is rewritten with those expressions (unlisted
          columns keep their target values);
        * else the row carries through unchanged.

        Unmatched target rows always carry through; unmatched SOURCE
        rows insert when ``insert_unmatched`` (they must then supply
        every target column). Delta's multiple-matches rule applies: a
        source with DUPLICATE keys would update one target row twice in
        an undefined order, so it is refused loudly up front. Snapshot
        isolation is merge()'s: reconcile against the version read at
        start, claim parent+1 — a concurrent commit turns into
        CommitConflict, never a lost update. CHECK constraints validate
        the final frame (updates can violate just as inserts can).

        Shape: ONE key-equi full-outer join target×source; every clause
        is a CASE over that joined row — no per-clause rescans. Like
        merge(), this rewrites the snapshot's files; a stats-pruned
        touched-file variant (replace_where's trick keyed by the
        source's key range) is the documented upgrade path when merges
        touch a narrow window of a huge table."""
        parent = self.version()
        # duplicate-source-key refusal comes BEFORE the empty-table
        # fallback: the deterministic-merge rule is about the SOURCE, so
        # a first load must be refused exactly like a merge against data
        # — otherwise the duplicates insert silently on day one and the
        # same call starts failing the day the table is non-empty
        dup = (
            source.groupBy(*key_cols)
            .count()
            .where(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            k = {c: dup[0][c] for c in key_cols}
            raise ValueError(
                f"merge_into: source has duplicate key {k} — multiple "
                "source rows would match one target row (Delta's "
                "deterministic-merge rule refuses this)"
            )
        if parent < 0:
            if not insert_unmatched:
                raise ValueError("merge_into on an empty table inserts only")
            return self.merge(spark, source, key_cols)
        target = self.read(spark, parent)
        cols = target.columns
        # existence sentinels, not key-null tests: eqNullSafe lets NULL
        # keys match each other, and a null-keyed matched row must still
        # read as matched
        t = target.withColumn("_t_exists", F.lit(True)).alias("t")
        s = source.withColumn("_s_exists", F.lit(True)).alias("s")
        cond = None
        for c in key_cols:
            eq = F.col(f"t.{c}").eqNullSafe(F.col(f"s.{c}"))
            cond = eq if cond is None else cond & eq
        joined = (
            t.join(s, cond, "full_outer")
            .withColumn(
                "_is_target", F.coalesce(F.col("t._t_exists"), F.lit(False))
            )
            .withColumn(
                "_matched",
                F.col("_is_target")
                & F.coalesce(F.col("s._s_exists"), F.lit(False)),
            )
        )
        # matched deletes drop; unmatched source rows drop unless inserting
        keep = F.lit(True)
        if matched_delete is not None:
            keep = keep & ~(
                F.col("_matched") & F.coalesce(F.expr(matched_delete), F.lit(False))
            )
        if not insert_unmatched:
            keep = keep & F.col("_is_target")
        survivors = joined.where(keep)
        out_cols = []
        upd = matched_update or {}
        for c in cols:
            updated = F.expr(upd[c]) if c in upd else F.col(f"t.{c}")
            out_cols.append(
                F.when(F.col("_matched"), updated)
                .when(F.col("_is_target"), F.col(f"t.{c}"))
                .otherwise(F.col(f"s.{c}"))
                .alias(c)
            )
        merged = survivors.select(*out_cols)
        self._enforce(merged)
        files = self._write_files(merged)
        return self._claim(
            {"files": files, "op": "merge_into", "schema": merged.schema.json()},
            parent,
        )

    def replace_where(
        self, spark: SparkSession, df: DataFrame, col: str, lo, hi
    ) -> int:
        """Transactional K3 (Delta ``replaceWhere``): atomically delete
        ``lo <= col <= hi`` and insert ``df`` — as ONE manifest flip.
        Only files whose stats OVERLAP the window are rewritten (their
        out-of-window survivors re-land in fresh files); every other
        file carries into the new version untouched, so the commit's
        write cost is bounded by the touched window, not the table.
        Incoming rows outside the window would silently survive the next
        refresh of a disjoint window, so they are rejected loudly (a
        real raise, not an assert — data-integrity contracts must not
        vanish under ``python -O``) — same contract as
        writes.refresh_window's refresh_predicate. NULL-keyed rows
        follow SQL DELETE semantics: a NULL predicate never deletes, so
        existing NULL rows SURVIVE the rewrite; for the same reason an
        incoming NULL row counts as out-of-window (it could never be
        replaced by a later refresh) and is rejected."""
        in_window = F.coalesce(F.col(col).between(lo, hi), F.lit(False))
        n_bad = df.where(~in_window).count()
        if n_bad:
            raise ValueError(
                f"replace_where: {n_bad} incoming rows fall outside "
                f"[{lo}, {hi}] on {col!r} (NULLs count as outside)"
            )
        self._enforce(df)
        parent = self.version()
        entries = self._manifest(parent)["files"] if parent >= 0 else []
        # point windows additionally consult the Bloom index: a file the
        # filter proves free of the key has nothing to delete — it
        # carries over physically untouched (ROADMAP r5 #9)
        touched = [e for e in entries if self._may_hold_range(e, col, lo, hi)]
        untouched = [e for e in entries if not self._may_hold_range(e, col, lo, hi)]
        new = self._write_files(df)
        if touched:
            survivors = self._read_entries(
                spark, touched, df.schema.json()
            ).where(~in_window)
            new += self._write_files(survivors)
        return self._claim(
            {
                "files": untouched + new,
                "op": "replace_where",
                "schema": df.schema.json(),
            },
            parent,
        )

    def delete_where(self, spark: SparkSession, col: str, value) -> int:
        """Transactional DELETE of every row with ``col = value`` — the
        right-to-be-forgotten primitive (the storage half of the
        anonimato_k / l_diversidad / t_cercania release audits): one
        manifest flip, and only files that MAY hold the value (stats
        range + Bloom filter both admit it) are rewritten without the
        matching rows; every other file carries into the new version
        physically untouched, so the cost is bounded by the subject's
        file footprint, not the table. NULL never equals — a NULL key
        row survives any delete_where, per SQL DELETE semantics.

        Honesty about erasure: prior versions still reference the old
        files (time travel works), so the data is GONE FROM HEAD but
        not from disk until ``vacuum`` passes the retention window —
        the retention setting IS the legal deletion horizon, exactly as
        in Delta. Returns the new version.

        ``value=None`` is refused: a point DELETE of NULL is ill-defined
        under the stated "NULL never equals" contract (eqNullSafe would
        silently match — and delete — every NULL-keyed row, and pruning
        degrades to rewriting all files). Use
        ``delete_matching("col IS NULL")`` to delete NULL rows on
        purpose."""
        if value is None:
            raise ValueError(
                "delete_where(value=None) is ill-defined — NULL never "
                "equals under SQL DELETE semantics; use "
                "delete_matching(f'{col} IS NULL') to delete NULL rows "
                "explicitly"
            )
        parent = self.version()
        if parent < 0:
            raise FileNotFoundError(f"txlog table {self.path!r} has no commits")
        m = self._manifest(parent)
        touched = [
            e
            for e in m["files"]
            if self._overlaps(e, col, value, value)
            and self._bloom_may_contain(e, col, value)
        ]
        untouched = [
            e
            for e in m["files"]
            if not (
                self._overlaps(e, col, value, value)
                and self._bloom_may_contain(e, col, value)
            )
        ]
        new = []
        if touched:
            survivors = self._read_entries(spark, touched, m["schema"]).where(
                ~F.col(col).eqNullSafe(F.lit(value))
            )
            new = self._write_files(survivors)
        return self._claim(
            {
                "files": untouched + new,
                "op": "delete_where",
                "schema": m["schema"],
            },
            parent,
        )

    def delete_matching(
        self,
        spark: SparkSession,
        predicate,
        prune: tuple[str, object, object] | None = None,
        prune_null: str | None = None,
    ) -> int:
        """Full Delta-style DELETE: drop every row where ``predicate``
        (a Column or SQL string) evaluates TRUE — NULL keeps the row,
        SQL DELETE semantics — in one manifest flip. ``prune`` is the
        optional stats hint ``(col, lo, hi)``: files whose recorded
        min/max provably miss the range carry over physically untouched
        (the caller asserts the predicate can only be TRUE inside the
        range — the same contract as Delta's partition-pruned DELETE);
        ``prune_null`` is its IS-NULL sibling (Delta's nullCount stat):
        the caller asserts the predicate can only be TRUE where that
        column IS NULL, so files whose recorded null count is ZERO carry
        over untouched — the pruning half of the sanctioned
        ``delete_matching("col IS NULL")`` path delete_where's refusal
        points at. Files with no recorded null count degrade to touched
        (correct, unpruned). Without any hint every file is rewritten.
        ``delete_where`` remains the point form with automatic
        stats+Bloom pruning; this is its arbitrary-predicate sibling."""
        parent = self.version()
        if parent < 0:
            raise FileNotFoundError(f"txlog table {self.path!r} has no commits")
        m = self._manifest(parent)
        cond = F.expr(predicate) if isinstance(predicate, str) else predicate
        if prune is not None and prune_null is not None:
            raise ValueError("pass prune OR prune_null, not both")
        if prune is not None:
            col, lo, hi = prune
            touched = [e for e in m["files"] if self._may_hold_range(e, col, lo, hi)]
            untouched = [
                e for e in m["files"] if not self._may_hold_range(e, col, lo, hi)
            ]
        elif prune_null is not None:

            def may_hold_null(entry) -> bool:
                nulls = entry.get("nulls", {}) if isinstance(entry, dict) else {}
                n = nulls.get(prune_null)
                return n is None or n > 0

            touched = [e for e in m["files"] if may_hold_null(e)]
            untouched = [e for e in m["files"] if not may_hold_null(e)]
        else:
            touched, untouched = list(m["files"]), []
        new = []
        if touched:
            survivors = self._read_entries(spark, touched, m["schema"]).where(
                ~F.coalesce(cond, F.lit(False))
            )
            new = self._write_files(survivors)
        return self._claim(
            {
                "files": untouched + new,
                "op": "delete_matching",
                "schema": m["schema"],
            },
            parent,
        )

    def replace_partitions(
        self,
        spark: SparkSession,
        df: DataFrame,
        partition_cols: list[str],
        refresh_predicate=None,
    ) -> int:
        """Transactional K3 in its PARTITION-VALUE form (the writes.py
        ``refresh_window`` semantics as one manifest flip): delete every
        row whose ``partition_cols`` tuple appears in ``df`` — within
        those tuples, only rows satisfying ``refresh_predicate`` when
        given (the reference's secondary DELETE predicate) — and insert
        ``df``. Files whose stats provably miss every incoming value
        carry over untouched; survivors of overlapping files re-land in
        fresh files. Readers keep their snapshot; a concurrent commit
        turns into a CommitConflict instead of a lost update."""
        if refresh_predicate is not None:
            pred_true = F.coalesce(refresh_predicate, F.lit(False))
            n_bad = df.where(~pred_true).count()
            if n_bad:
                raise ValueError(
                    f"replace_partitions: {n_bad} incoming rows violate "
                    "refresh_predicate (NULLs count as violating) — they "
                    "would duplicate against the preserved slice"
                )
        self._enforce(df)
        parent = self.version()
        entries = self._manifest(parent)["files"] if parent >= 0 else []
        tuples = df.select(*partition_cols).distinct()
        values = tuples.collect()  # touched-partition list: small by K3 contract

        def touched(entry) -> bool:
            # conservative: a file may hold a tuple iff EVERY column's
            # stats admit that column's value for SOME incoming tuple
            return any(
                all(self._overlaps(entry, c, row[c], row[c]) for c in partition_cols)
                for row in values
            )

        hit = [e for e in entries if touched(e)]
        untouched = [e for e in entries if not touched(e)]
        new = self._write_files(df)
        if hit:
            old = self._read_entries(spark, hit, df.schema.json())
            in_window = F.lit(False)
            for row in values:
                cond = F.lit(True)
                for c in partition_cols:
                    cond = cond & F.col(c).eqNullSafe(F.lit(row[c]))
                in_window = in_window | cond
            if refresh_predicate is not None:
                in_window = in_window & F.coalesce(refresh_predicate, F.lit(False))
            survivors = old.where(~in_window)
            new += self._write_files(survivors)
        return self._claim(
            {
                "files": untouched + new,
                "op": "replace_partitions",
                "schema": df.schema.json(),
            },
            parent,
        )

    # -- maintenance ------------------------------------------------------
    def optimize_zorder(
        self,
        spark: SparkSession,
        cols: list[str],
        n_files: int = 16,
        bits: int = 4,
    ) -> int:
        """OPTIMIZE ZORDER BY — rewrite the current snapshot's files
        along the Morton curve of ``cols`` so every file's min/max
        stats become a tight rectangle in EVERY listed dimension:
        `read_where`/`replace_where` pruning then works for all of
        them, not just the ingest order's leading key (the measured
        pruning matrix lives in the `zorden_poda` registry query —
        lexicographic 5/64 vs 33/64 on leading/other key, z-order
        16/64 vs 12/64).

        Each column is first bucketed into 2^bits quantile tiles
        (value-distribution-proof, like Delta's range ids). Tile
        boundaries are EXACT row-rank quantiles from the per-value
        histogram when the column's distinct cardinality is within
        ``_Z_DISTINCT_CAP`` (a pure function of the data multiset —
        deterministic across sessions and layouts; ``approxQuantile``
        past the cap, deterministic per layout only), broadcast as
        ≤2^bits literals — and assignment is a
        map-side comparison sum, sothe maintenance op performs NO
        global sort of the table (VERDICT r11 flagged the former
        unpartitioned-ntile form as a one-task sort at scale; tied
        values now share a tile, which only widens that value's
        rectangle). The tiles' bits interleave into the curve position,
        and file assignment is DETERMINISTIC exact z-value bucketing
        (VERDICT r13 #1): file(row) = z·n_files div 2^(bits·|cols|), a
        pure function of the row's values — the former
        ``repartitionByRange`` laid boundaries from a RANDOM sample, so
        file rectangles (and therefore stats-pruning effectiveness)
        varied run to run right at tight thresholds. Each bucket routes
        to its own output partition through an inverse-Murmur3 key (no
        sampling, no cross-bucket collisions), so OPTIMIZE ZORDER's
        pruning guarantee is a property of the data, not a
        distribution. Data is byte-identical (one manifest flip,
        op='optimize_zorder'); prior versions stay readable; a
        concurrent commit raises CommitConflict rather than losing
        either write."""
        parent = self.version()
        if parent < 0:
            raise FileNotFoundError(f"txlog table {self.path!r} has no commits")
        m = self._manifest(parent)
        df = self._read_entries(spark, m["files"], m["schema"])
        nb = 1 << bits
        aux = []
        for ci, c in enumerate(cols):
            bcol = f"__zb{ci}"
            vals = df.select(F.col(c).cast("double").alias("__q")).where(
                F.col("__q").isNotNull()
            )
            # Tile borders are EXACT row-rank quantiles whenever the
            # column's distinct cardinality is bounded: the per-value
            # histogram (one map-side-combined groupBy) collects and the
            # borders derive by cumulative count — a pure function of
            # the DATA MULTISET, independent of file layout, splits, and
            # parallelism (approxQuantile's GK sketch is deterministic
            # only per physical layout, and repartitionByRange seeds by
            # session RDD id, so "the same data" can tile differently
            # across sessions). Realistic z-order dimensions (days,
            # bucketed ids, categories) sit far under the cap; past it
            # the approx path still yields a valid monotone tiling,
            # deterministic per snapshot layout.
            pares = vals.groupBy("__q").agg(
                F.count(F.lit(1)).alias("cnt")
            ).limit(_Z_DISTINCT_CAP + 1).collect()
            if len(pares) <= _Z_DISTINCT_CAP:
                pares.sort(key=lambda r: r["__q"])
                n_col = sum(r["cnt"] for r in pares)
                objetivos = [
                    -(-(n_col * i) // nb) for i in range(1, nb)
                ]
                bordes, acumulado, ti = [], 0, 0
                for r in pares:
                    acumulado += r["cnt"]
                    while ti < nb - 1 and acumulado >= objetivos[ti]:
                        bordes.append(float(r["__q"]))
                        ti += 1
                bordes = sorted(set(bordes))
            else:
                qs = [i / nb for i in range(1, nb)]
                bordes = sorted(
                    set(vals.stat.approxQuantile("__q", qs, 1.0 / (4 * nb)))
                )
            tile = F.lit(0)
            for b in bordes:
                tile = tile + (F.col(c).cast("double") > F.lit(b)).cast("int")
            df = df.withColumn(bcol, tile)
            aux.append(bcol)
        stride = len(cols)
        terms = [
            f"shiftleft((shiftright(__zb{ci}, {i}) & 1), {i * stride + ci})"
            for ci in range(stride)
            for i in range(bits)
        ]
        df = df.withColumn("__z", F.expr(" + ".join(terms)))
        # exact z-value bucketing: z < 2^(bits·stride), so the bucket is
        # a pure row-value function with n_files contiguous curve
        # segments — then an inverse-hash key routes bucket b to output
        # partition b exactly (hash partitioning is content-based, so
        # the layout is independent of input splits / parallelism;
        # repartitionByRange's sampled boundaries were not)
        z_span = 1 << (bits * stride)
        bucket = F.expr(f"CAST((__z * {n_files}) DIV {z_span} AS INT)")
        claves = _inverse_hash_keys(spark, n_files)
        df = df.withColumn(
            "__zf",
            F.element_at(
                F.array(*[F.lit(k).cast("bigint") for k in claves]),
                bucket + F.lit(1),
            ),
        )
        laid = (
            df.repartition(n_files, F.col("__zf"))
            .sortWithinPartitions("__z")
            .drop("__z", "__zf", *aux)
        )
        files = self._write_files(laid)
        return self._claim(
            {"files": files, "op": "optimize_zorder", "schema": m["schema"]},
            parent,
        )

    def optimize_compact(
        self,
        spark: SparkSession,
        small_bytes: int = 8 * 1024 * 1024,
        n_files: int = 1,
        cluster_col: str | None = None,
    ) -> int:
        """Small-file compaction (Delta OPTIMIZE's bin-packing half):
        streaming appends land one small file per micro-batch, and a
        year of hourly commits is 8 760 files whose per-file overhead
        (footer reads, task scheduling, manifest size) dominates the
        scan. Files under ``small_bytes`` are rewritten together into
        ``n_files`` and committed as one manifest flip; files already
        big CARRY OVER untouched — the rewrite cost is bounded by the
        small tail, not the table. Data is byte-identical; prior
        versions stay readable; returns the new version (or the current
        one if ≤1 small file exists — nothing to compact).

        ``cluster_col``: range-cluster the rewrite on this column
        (Delta OPTIMIZE's ZORDER half, one-dimensional) so each output
        file covers a contiguous value range and the per-file min/max
        stats stay TIGHT — without it a coalesce interleaves the small
        files' rows and a stats-pruned scan (read_where) degrades to
        reading every compacted file. The ANN posting table compacts
        with cluster_col='celda' for exactly this reason."""
        parent = self.version()
        if parent < 0:
            raise FileNotFoundError(f"txlog table {self.path!r} has no commits")
        m = self._manifest(parent)

        sized = [
            (e, os.path.getsize(os.path.join(self.data_dir, self._names([e])[0])))
            for e in m["files"]
        ]  # stat each file once (and at one point in time)
        small = [e for e, s in sized if s < small_bytes]
        big = [e for e, s in sized if s >= small_bytes]
        if len(small) <= 1:
            return parent
        df = self._read_entries(spark, small, m["schema"])
        if cluster_col is None:
            packed = df.coalesce(n_files)
        else:
            packed = df.repartitionByRange(n_files, cluster_col)
        new = self._write_files(packed)
        return self._claim(
            {"files": big + new, "op": "optimize_compact", "schema": m["schema"]},
            parent,
        )

    def clone_to(self, dst_path: str, version: int | None = None) -> "TxTable":
        """ZERO-COPY CLONE (Delta SHALLOW CLONE semantics, hard-link
        implementation): create a new independent table at ``dst_path``
        whose v0 is the source's snapshot at ``version`` (default HEAD).
        Data files HARD-LINK into the clone — no bytes copied, O(files)
        metadata work — and because data files are immutable on both
        sides, the clone and the source then diverge freely: writes to
        either never touch the other, and either side's vacuum only
        unlinks ITS directory entry (the inode survives until the last
        table drops it). The classic uses: a dev/test copy of a
        production mart, or a frozen training-data snapshot that keeps
        living while the source keeps ingesting."""
        v = self.version() if version is None else version
        if v < 0:
            raise FileNotFoundError(f"txlog table {self.path!r} has no commits")
        m = self._manifest(v)
        dst = TxTable(
            dst_path,
            stats_cols=self.stats_cols,
            bloom_cols=self.bloom_cols,
            bloom_bits=self.bloom_bits,
            bloom_hashes=self.bloom_hashes,
        )
        for name in self._names(m["files"]):
            src_f = os.path.join(self.data_dir, name)
            dst_f = os.path.join(dst.data_dir, name)
            if not os.path.exists(dst_f):
                os.link(src_f, dst_f)
        dst._claim(
            {
                "files": m["files"],
                "op": "clone",
                "schema": m["schema"],
                "cloned_from": self.path,
                "cloned_version": v,
            },
            -1,
        )
        return dst

    def restore(self, version: int) -> int:
        """Delta-style RESTORE: commit a NEW version whose file set IS
        the target version's — time travel made durable. Nothing is
        rewritten and history is preserved (the restore is itself an
        ordinary commit on top of the current head, so the bad versions
        remain readable for forensics); readers at HEAD simply see the
        old snapshot again. Because data files are immutable, this is a
        manifest flip — O(KB) regardless of table size. Fails loudly if
        ``vacuum`` already reclaimed any file the target references
        (the retention window is the undo horizon). The change feed
        treats a restore as a rewrite: ``changes`` across it raises
        NonIncrementalHistory, exactly like merge/overwrite."""
        try:
            m = self._manifest(version)
        except FileNotFoundError as exc:
            # vacuum drops old MANIFESTS too — a vacuumed target version
            # is the same "past the undo horizon" condition as vacuumed
            # data files, and must fail with the same documented error.
            raise ValueError(
                f"restore: version {version} has no manifest (vacuumed) — "
                "past the retention undo horizon"
            ) from exc
        missing = [
            n
            for n in self._names(m["files"])
            if not os.path.exists(os.path.join(self.data_dir, n))
        ]
        if missing:
            raise ValueError(
                f"restore: version {version} references vacuumed files "
                f"{missing[:3]}{'...' if len(missing) > 3 else ''} — "
                "past the retention undo horizon"
            )
        # Delta RESTORE restores METADATA with the data: the target
        # era's constraint set comes back explicitly (an era with no
        # constraints restores to none — the explicit {} overrides
        # _claim's parent carry-forward). The txn fence map is NOT
        # restored: idempotency markers are monotone facts about what
        # was ever applied, and reviving older ones would reopen the
        # double-append window the fence exists to close.
        return self._claim(
            {
                "files": m["files"],
                "op": "restore",
                "schema": m["schema"],
                "restored_from": version,
                "constraints": m.get("constraints", {}),
            },
            self.version(),
        )

    # -- tags: named refs (Iceberg-style), vacuum GC roots ------------------
    def _tag_path(self, name: str) -> str:
        return os.path.join(self.log_dir, f"tag_{name}.json")

    def create_tag(self, name: str, version: int | None = None) -> int:
        """Pin a NAMED, immutable ref to a version (Iceberg tag
        semantics): ``read_tag`` resolves it forever, and ``vacuum``
        treats tagged versions as GC ROOTS — their manifest and data
        files survive any retention policy until the tag is deleted.
        That is the release-pinning contract: a model card that says
        'trained on corpus@v12' needs v12 readable after the nightly
        vacuum, not best-effort. Tags are immutable (re-pointing is
        delete + create, both explicit); duplicate names and unknown
        versions are refused loudly."""
        if not name.isidentifier():
            raise ValueError(f"tag name must be an identifier: {name!r}")
        v = self.version() if version is None else version
        if v < 0 or not os.path.exists(os.path.join(self.log_dir, f"v{v}.json")):
            raise ValueError(f"cannot tag unknown version {v} of {self.path!r}")
        tmp = os.path.join(self.log_dir, f"_tmp_{uuid.uuid4().hex[:8]}.json")
        with open(tmp, "w") as fh:
            json.dump({"name": name, "version": v, "created_at": time.time()}, fh)
        try:
            os.link(tmp, self._tag_path(name))
        except FileExistsError as exc:
            raise ValueError(
                f"tag {name!r} already exists on {self.path!r} "
                "(tags are immutable — delete_tag first to re-point)"
            ) from exc
        finally:
            os.unlink(tmp)
        return v

    def tags(self) -> dict[str, int]:
        out: dict[str, int] = {}
        for f in os.listdir(self.log_dir):
            if f.startswith("tag_") and f.endswith(".json"):
                try:
                    with open(os.path.join(self.log_dir, f)) as fh:
                        t = json.load(fh)
                except FileNotFoundError:
                    continue  # concurrent delete_tag between listdir & open
                out[t["name"]] = t["version"]
        return out

    def read_tag(self, spark: SparkSession, name: str) -> DataFrame:
        ts = self.tags()
        if name not in ts:
            raise ValueError(f"no such tag {name!r} on {self.path!r}")
        return self.read(spark, version=ts[name])

    def delete_tag(self, name: str) -> None:
        try:
            os.unlink(self._tag_path(name))
        except FileNotFoundError as exc:
            raise ValueError(
                f"no such tag {name!r} on {self.path!r}"
            ) from exc

    # -- write-audit-publish (Iceberg WAP / staged commits) -----------------
    def _staged_path(self, staging_id: str) -> str:
        return os.path.join(self.log_dir, f"staged_{staging_id}.json")

    def _staged_manifest(self, staging_id: str) -> dict:
        try:
            with open(self._staged_path(staging_id)) as fh:
                return json.load(fh)
        except FileNotFoundError as exc:
            raise ValueError(
                f"unknown staging id {staging_id!r} on {self.path!r} "
                "(already published or discarded?)"
            ) from exc

    def _resolve_staging(self, id_or_name: str) -> str:
        """Accept a staging id or a stage NAME; names resolve to the one
        live stage carrying them (uniqueness enforced at stage time)."""
        if os.path.exists(self._staged_path(id_or_name)):
            return id_or_name
        for sid, meta in self.staged().items():
            if meta.get("name") == id_or_name:
                return sid
        return id_or_name  # let _staged_manifest raise the loud unknown

    def _stage_name_marker(self, name: str) -> str:
        import hashlib

        h = hashlib.sha1(name.encode("utf-8")).hexdigest()[:16]
        return os.path.join(self.log_dir, f"stagename_{h}.json")

    def _claim_stage_name(self, name: str, sid: str) -> None:
        """ATOMIC name claim (ADVICE r9): the old uniqueness check was
        scan-then-write, so two concurrent stagers under one name could
        both pass and leave two live stages the name resolved between by
        listdir order. The claim is now a hard-link marker (same atomic
        idiom as ``_claim``): first link wins, EEXIST is the loud
        refusal. A marker whose staged manifest is gone is a crash
        leftover (publish/discard unlink the manifest FIRST, and the
        marker is only ever linked after its manifest).

        STALE-MARKER RECLAIM (ADVICE r10): reclaim is an atomic
        ``os.rename`` to a unique tombstone — never a bare unlink. Two
        racers that both read the same crash leftover would, under
        unlink, both 'remove' it, and the slower unlink deletes the
        faster racer's FRESHLY LINKED live marker, letting both claims
        succeed (the duplicate-name bug this marker exists to prevent).
        rename removes exactly the inode at the path ONCE: the loser
        gets FileNotFoundError and retries the link, hitting EEXIST on
        the winner's fresh marker. Two guards close the residual
        read→rename window: the winner VERIFIES ownership by re-reading
        the marker after linking, and a reclaimer that finds its
        tombstone holds a LIVE claim (the holder linked between the read
        and the rename) restores it and refuses. Exhausted retries raise
        a contention error, not the misleading 'already active' (ADVICE
        r10: repeated benign races — holder vanishing between the link
        attempt and the marker read — are transient, not a live
        duplicate)."""
        marker = self._stage_name_marker(name)
        tmp = os.path.join(self.log_dir, f"_tmp_{uuid.uuid4().hex[:8]}.json")
        with open(tmp, "w") as fh:
            json.dump({"name": name, "sid": sid}, fh)
            fh.flush()
            os.fsync(fh.fileno())
        already = ValueError(
            f"stage name {name!r} is already active on {self.path!r} "
            "— publish or discard it first (names are unique among "
            "live stages)"
        )
        try:
            for _ in range(16):
                try:
                    os.link(tmp, marker)
                except FileExistsError:
                    pass
                else:
                    # verify-after-link: a concurrent stale-reclaim that
                    # read the OLD marker may have renamed OURS away in
                    # its read→rename window; if the path no longer
                    # carries our sid the claim was stolen — retry.
                    try:
                        with open(marker) as fh:
                            if json.load(fh).get("sid") == sid:
                                return
                    except (FileNotFoundError, json.JSONDecodeError):
                        pass
                    continue
                try:
                    with open(marker) as fh:
                        prev = json.load(fh)
                except (FileNotFoundError, json.JSONDecodeError):
                    continue  # holder vanished / mid-race — retry the link
                if os.path.exists(self._staged_path(prev.get("sid", ""))):
                    if prev.get("sid") == sid:
                        # the marker already carries OUR claim: a
                        # reclaim-then-restore race can re-present our own
                        # restored marker on the retry path — raising
                        # 'already active' here would make the caller
                        # unstage its own valid batch (ADVICE r11).
                        return
                    raise already
                # stale marker from a crashed publish/discard: reclaim by
                # atomic rename — only one racer wins removal
                tomb = os.path.join(
                    self.log_dir, f"_tomb_{uuid.uuid4().hex[:8]}.json"
                )
                try:
                    os.rename(marker, tomb)
                except FileNotFoundError:
                    continue  # another reclaimer won — retry the link
                try:
                    with open(tomb) as fh:
                        got = json.load(fh)
                except (OSError, json.JSONDecodeError):
                    got = {}
                if got.get("sid") != prev.get("sid") and os.path.exists(
                    self._staged_path(got.get("sid", ""))
                ):
                    # we renamed a DIFFERENT, live marker (holder claimed
                    # between our read and our rename) — restore it and
                    # refuse: the name is genuinely held. The restore
                    # itself can race a THIRD claimant linking a fresh
                    # marker (ADVICE r11): blindly unlinking the tombstone
                    # on FileExistsError would destroy the live holder's
                    # claim record while the racer's survives — the exact
                    # duplicate this mechanism exists to prevent. So on
                    # EEXIST we validate the racer: stale → reclaim it and
                    # retry the restore; live → hard error, KEEPING the
                    # tombstone as the holder's durable record.
                    for _ in range(16):
                        try:
                            os.link(tomb, marker)
                        except FileExistsError:
                            try:
                                with open(marker) as fh:
                                    cur = json.load(fh)
                            except (FileNotFoundError, json.JSONDecodeError):
                                continue  # racer vanished — retry restore
                            if cur.get("sid") == got.get("sid"):
                                break  # someone already restored the holder
                            if os.path.exists(
                                self._staged_path(cur.get("sid", ""))
                            ):
                                raise RuntimeError(
                                    f"stage name {name!r} on {self.path!r}: "
                                    "two LIVE claims collided during a "
                                    "stale-marker reclaim (holder sid "
                                    f"{got.get('sid')!r} preserved in "
                                    f"{tomb!r}, racer sid "
                                    f"{cur.get('sid')!r} holds the marker) "
                                    "— manual reconciliation required"
                                )
                            racer_tomb = os.path.join(
                                self.log_dir,
                                f"_tomb_{uuid.uuid4().hex[:8]}.json",
                            )
                            try:
                                os.rename(marker, racer_tomb)
                            except FileNotFoundError:
                                continue
                            os.unlink(racer_tomb)
                            continue
                        else:
                            break
                    else:
                        raise RuntimeError(
                            f"stage-name restore for {name!r} on "
                            f"{self.path!r} lost 16 consecutive races — "
                            f"holder record preserved in {tomb!r}"
                        )
                    os.unlink(tomb)
                    raise already
                os.unlink(tomb)
            raise RuntimeError(
                f"stage-name claim for {name!r} on {self.path!r} lost "
                "16 consecutive races (markers vanishing mid-claim) — "
                "transient contention, retry the stage"
            )
        finally:
            os.unlink(tmp)

    def _release_stage_name(self, manifest: dict) -> None:
        if manifest.get("name") is not None:
            try:
                os.unlink(self._stage_name_marker(manifest["name"]))
            except FileNotFoundError:
                pass

    def stage_append(self, df: DataFrame, name: str | None = None) -> str:
        """WRITE half of write-audit-publish (the Iceberg WAP pattern):
        the batch's data files land in the data dir and a STAGED manifest
        records them, but no version flips — readers cannot see the rows,
        and vacuum's staged-file root set protects them from GC while
        they await audit. Returns the staging id for ``read_staged`` /
        ``publish`` / ``discard_staged``.

        NAMED STAGES (Iceberg's multi-branch WAP): pass ``name`` to label
        the stage; any number of pipelines can stage/audit/publish
        INDEPENDENTLY on one table — each stage sees head + ITS OWN rows
        only, publishes in any order, and vacuum protects every live
        stage's files. Names are unique among ACTIVE stages (a second
        stage under a live name is refused loudly — two pipelines racing
        one label is a wiring bug); the name frees on publish/discard.
        read_staged/publish/discard_staged accept the id or the name.

        Nothing is validated here BY DESIGN: the audit window is where
        quality gates run (on the would-be state, via read_staged), and
        publish() re-checks constraints and schema evolution against the
        head AT PUBLISH TIME — the head may have moved since staging, and
        append semantics make that legal (disjoint files)."""
        files = self._write_files(df)
        sid = uuid.uuid4().hex[:8]
        payload = {
            "files": files,
            "op": "append",
            "schema": df.schema.json(),
            "base_version": self.version(),
            "staged_at": time.time(),
            "name": name,
        }
        tmp = os.path.join(self.log_dir, f"_tmp_{uuid.uuid4().hex[:8]}.json")
        with open(tmp, "w") as fh:
            json.dump(payload, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.link(tmp, self._staged_path(sid))
        os.unlink(tmp)
        if name is not None:
            # Claim AFTER the manifest is live so a marker without its
            # manifest is always a crash leftover (reclaimable), never a
            # racer mid-stage. Losing the claim unstages this batch.
            try:
                self._claim_stage_name(name, sid)
            except (ValueError, RuntimeError):
                # lost the name (live holder) OR exhausted contention
                # retries — either way this batch must not stay staged
                try:
                    os.unlink(self._staged_path(sid))
                except FileNotFoundError:
                    pass
                raise
        return sid

    def staged(self) -> dict[str, dict]:
        """Staging inventory: id -> {base_version, staged_at, n_files,
        name} (name None for anonymous stages)."""
        out: dict[str, dict] = {}
        for f in os.listdir(self.log_dir):
            if f.startswith("staged_") and f.endswith(".json"):
                sid = f[len("staged_"):-5]
                try:
                    m = self._staged_manifest(sid)
                except ValueError:
                    continue  # concurrent publish/discard unlinked it mid-scan
                out[sid] = {
                    "base_version": m["base_version"],
                    "staged_at": m["staged_at"],
                    "n_files": len(m["files"]),
                    "name": m.get("name"),
                }
        return out

    def read_staged(self, spark: SparkSession, staging_id: str) -> DataFrame:
        """AUDIT half of WAP: the WOULD-BE table state if the staged
        batch published right now — current head's files plus the staged
        files, under the staged schema (exactly what the published
        append's manifest would govern). Quality gates, row-count diffs,
        and constraint dry-runs read this; the real table stays
        untouched. Accepts the staging id or the stage name."""
        m = self._staged_manifest(self._resolve_staging(staging_id))
        parent = self.version()
        base = self._manifest(parent)["files"] if parent >= 0 else []
        return self._read_entries(spark, base + m["files"], m["schema"])

    def publish(self, spark: SparkSession, staging_id: str) -> int:
        """PUBLISH half of WAP: one atomic version flip making the staged
        batch visible. Validation happens HERE, against the head at
        publish time — CHECK constraints evaluate over the staged rows
        (one aggregation pass over only the staged files) and the
        append-evolution gate (type drift / rename shape) runs against
        the current schema, because the head may have moved since
        staging; append semantics make a moved head legal (file sets are
        disjoint), so a WAP publish never needs the base_version it was
        staged against. A concurrent commit during publish raises
        CommitConflict (retry republishes the same staged files — they
        are still on disk and still staged). On success the staged
        manifest is consumed; a second publish of the same id raises.

        CRASH-WINDOW FENCE (ADVICE r8): the version flip (_claim) and the
        staged-manifest unlink are two steps — a crash between them
        leaves the staged manifest alive after the publish landed, and a
        naive retry would append the same file entries a SECOND time.
        Each published manifest therefore records its ``staging_id``
        (mirroring the txnAppId/txnVersion fence on streaming appends),
        and publish first scans manifests newer than the staged batch's
        base_version: if one carries this id, the flip already happened —
        consume the leftover staged manifest and return that committed
        version (idempotent) instead of duplicating the rows."""
        staging_id = self._resolve_staging(staging_id)
        m = self._staged_manifest(staging_id)
        parent = self.version()
        for v in self._versions():
            if v <= m.get("base_version", -1):
                continue
            try:
                prior = self._manifest(v)
            except (FileNotFoundError, ValueError, json.JSONDecodeError):
                continue  # vacuumed / racing writer — not this publish
            if prior.get("staging_id") == staging_id:
                try:
                    os.unlink(self._staged_path(staging_id))
                except FileNotFoundError:
                    pass
                self._release_stage_name(m)
                return v
        self._check_append_evolution(
            parent, StructType.fromJson(json.loads(m["schema"]))
        )
        staged_rows = self._read_entries(spark, m["files"], m["schema"])
        self._enforce(staged_rows)
        base = self._manifest(parent)["files"] if parent >= 0 else []
        v = self._claim(
            {
                "files": base + m["files"],
                "op": "append",
                "schema": m["schema"],
                "staging_id": staging_id,
            },
            parent,
        )
        os.unlink(self._staged_path(staging_id))
        self._release_stage_name(m)
        return v

    def discard_staged(self, staging_id: str) -> None:
        """Abandon a staged batch: the manifest goes now; the data files
        become unreferenced orphans that the next vacuum (past its
        retention window) collects. Accepts the staging id or name."""
        sid = self._resolve_staging(staging_id)
        m = self._staged_manifest(sid)  # raises the loud unknown
        try:
            os.unlink(self._staged_path(sid))
        except FileNotFoundError as exc:
            raise ValueError(
                f"unknown staging id {staging_id!r} on {self.path!r}"
            ) from exc
        self._release_stage_name(m)

    def vacuum(self, keep_versions: int = 1, retention_s: float = 3600.0) -> int:
        """Drop manifests older than the last ``keep_versions`` and every
        data file no surviving manifest references (crashed-writer
        orphans included). Returns the number of files removed.

        ``retention_s`` is the Delta-style grace window: an unreferenced
        file younger than it is SKIPPED, because a concurrent writer
        between its ``_write_files`` and ``_claim`` has staged files that
        no manifest references YET — deleting them would commit a
        manifest pointing at missing files. Pass ``retention_s=0`` only
        when no in-flight writers exist (e.g. tests).

        GC roots beyond the retention window: TAGGED versions (their
        manifest and files survive until the tag is deleted — the
        release-pinning contract) and WAP-STAGED batches (their files
        are referenced by a staged manifest awaiting audit, regardless
        of age)."""
        import time as _time

        vs = self._versions()
        keep = set(vs[-keep_versions:] if keep_versions > 0 else vs)
        keep.update(v for v in self.tags().values() if v in vs)
        # ADVICE r9: a committed manifest carrying a ``staging_id`` is the
        # crash-window FENCE for its leftover staged twin — if vacuum drops
        # the fence while the twin is alive, a publish retry re-appends the
        # same files. Consume the twin (the publish DID land; the staged
        # files are referenced by every newer append manifest) BEFORE the
        # fence manifest can vanish.
        for v in vs:
            if v in keep:
                continue
            try:
                man = self._manifest(v)
            except (FileNotFoundError, ValueError, json.JSONDecodeError):
                continue
            sid = man.get("staging_id")
            if sid and os.path.exists(self._staged_path(sid)):
                try:
                    twin = self._staged_manifest(sid)
                    os.unlink(self._staged_path(sid))
                    self._release_stage_name(twin)
                except (ValueError, FileNotFoundError):
                    pass  # raced with the retrying publisher — its problem now
        # Stale name markers (crash between staged-manifest unlink and
        # marker unlink) are reclaimable the moment their manifest is gone.
        for f in os.listdir(self.log_dir):
            if f.startswith("stagename_") and f.endswith(".json"):
                p = os.path.join(self.log_dir, f)
                try:
                    with open(p) as fh:
                        mk = json.load(fh)
                except (FileNotFoundError, json.JSONDecodeError):
                    continue
                if not os.path.exists(self._staged_path(mk.get("sid", ""))):
                    try:
                        os.unlink(p)
                    except FileNotFoundError:
                        pass
        live: set[str] = set()
        for v in keep:
            live.update(self._names(self._manifest(v)["files"]))
        for sid in self.staged():
            try:
                live.update(self._names(self._staged_manifest(sid)["files"]))
            except ValueError:
                continue  # published/discarded between staged() and here
        removed = 0
        for v in vs:
            if v not in keep:
                os.unlink(os.path.join(self.log_dir, f"v{v}.json"))
        cutoff = _time.time() - retention_s
        for f in os.listdir(self.data_dir):
            if f.endswith(".parquet") and f not in live:
                p = os.path.join(self.data_dir, f)
                try:
                    if os.path.getmtime(p) > cutoff:
                        continue  # possibly staged by an in-flight commit
                    os.unlink(p)
                except FileNotFoundError:
                    continue  # a concurrent vacuum/writer raced us
                removed += 1
        return removed

    # -- change feed ------------------------------------------------------
    def diff(
        self,
        spark: SparkSession,
        v_old: int,
        v_new: int,
        key_cols: list[str],
    ) -> DataFrame:
        """SNAPSHOT DIFF between two versions — the table-comparison
        complement to ``changes()``: where the change feed replays the
        WRITES between versions (and refuses across rewrites), diff
        compares the READ STATES and therefore works across ANY history
        — merges, overwrites, restores — because immutable snapshots
        are always re-readable. One full-outer join on ``key_cols``;
        per key the row is tagged ``agregada`` (only in new),
        ``eliminada`` (only in old), ``modificada`` (present in both,
        any shared non-key column differs, null-safely) or ``igual``.
        Returns (key cols…, estado); callers aggregate counts. Cost is
        a join of the two snapshots — the honest price of diffing
        across a rewrite, paid only when asked."""
        old = self.read(spark, v_old)
        new = self.read(spark, v_new)
        comunes = [
            c for c in old.columns if c in new.columns and c not in key_cols
        ]
        o = old.select(
            *key_cols, *[F.col(c).alias(f"__o_{c}") for c in comunes]
        )
        n = new.select(
            *key_cols,
            F.lit(1).alias("__en_new"),
            *[F.col(c).alias(f"__n_{c}") for c in comunes],
        )
        j = o.withColumn("__en_old", F.lit(1)).join(n, key_cols, "full_outer")
        cambio = F.lit(False)
        for c in comunes:
            cambio = cambio | ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
        estado = (
            F.when(F.col("__en_old").isNull(), "agregada")
            .when(F.col("__en_new").isNull(), "eliminada")
            .when(cambio, "modificada")
            .otherwise("igual")
        )
        return j.select(*key_cols, estado.alias("estado"))

    def changes(
        self,
        spark: SparkSession,
        since_version: int,
        until_version: int | None = None,
    ) -> DataFrame:
        """INCREMENTAL CONSUMPTION (the Delta change-feed shape for
        append-flavored tables): rows committed after ``since_version``
        (exclusive) up to ``until_version`` (inclusive, default latest),
        each tagged with its ``_commit_version`` — a downstream job
        checkpoints the last version it processed and reads only the
        delta, never rescanning the table.

        Contract, stated instead of guessed: versions whose op is
        ``append`` contribute exactly their NEW files (rows = the
        appended batch); ``optimize_zorder``/``optimize_compact`` are
        data-preserving rewrites and contribute nothing (their rewritten
        files are tracked so later appends still diff correctly — no
        double counting through a compaction); ``add_constraint``/
        ``drop_constraint`` are manifest-only (file set identical) and
        likewise contribute nothing — Delta CDF treats metadata-only
        commits as empty, and a consumer must not lose its feed because
        an operator tightened a CHECK; any data-REWRITING op
        (``merge``, ``replace_where``, ``replace_partitions``,
        ``overwrite``) raises :class:`NonIncrementalHistory` unless its
        parent file set was empty (a first load is all-inserts whatever
        its op). Cost: manifest walking is KB-sized metadata; the scan
        touches only the delta files."""
        until = self.version() if until_version is None else until_version
        if since_version > until:
            raise ValueError(
                f"changes: since={since_version} is past until={until}"
            )
        have: set[str] = set()
        if since_version >= 0:
            have = set(self._names(self._manifest(since_version)["files"]))
        parts: list[DataFrame] = []
        schema_json = None
        for v in range(max(since_version + 1, 0), until + 1):
            m = self._manifest(v)
            schema_json = m["schema"]
            op = m.get("op", "append")
            names_v = self._names(m["files"])
            if op in (
                "optimize_zorder",
                "optimize_compact",
                "add_constraint",
                "drop_constraint",
            ):
                have = set(names_v)
                continue
            if op != "append" and have:
                raise NonIncrementalHistory(
                    f"version {v} op={op!r} rewrote data; read the "
                    f"snapshot (read(version={v})) and restart the feed"
                )
            new = [e for e in m["files"] if (e["name"] if isinstance(e, dict) else e) not in have]
            if new:
                parts.append(
                    self._read_entries(spark, new, m["schema"]).withColumn(
                        "_commit_version", F.lit(v).cast("long")
                    )
                )
            have = set(names_v)
        if not parts:
            if schema_json is None:
                if until >= 0:
                    schema_json = self._manifest(until)["schema"]
                else:
                    raise FileNotFoundError(
                        f"txlog table {self.path!r} has no commits"
                    )
            empty = self._read_entries(spark, [], schema_json)
            return empty.withColumn("_commit_version", F.lit(None).cast("long"))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out


def mirror_incremental(
    spark: SparkSession,
    src: TxTable,
    dst: TxTable,
    transform=None,
) -> dict:
    """Maintain ``dst`` as a derived mirror of ``src`` from the CHANGE
    FEED — the materialized-view refresh loop every downstream mart
    runs: read only the delta since the last mirrored version, apply
    ``transform`` (identity by default), commit. The last-mirrored
    upstream version is recorded as the txn fence
    ``("mirror:<src>", upstream_version)`` IN dst's manifest, which
    buys three properties at once: the marker commits ATOMICALLY with
    the data it describes, it SURVIVES dst maintenance (compaction /
    other writers — _claim carries the txn map through every manifest),
    and a crashed-and-rerun refresh is a NO-OP instead of a double
    append (the streaming jobs' exactly-once discipline, batch-side).

    Upstream rewrites (merge/overwrite/replace) make the feed
    non-incremental; the mirror then REBUILDS from the snapshot —
    degradation is loud in the returned ``mode``, never silent schema
    or row drift. Cost: incremental refreshes scan only the delta
    files (KB of manifest metadata + the new parquet); the rebuild
    path scans the snapshot exactly like the first load."""
    app = f"mirror:{os.path.abspath(src.path)}"
    last = dst.txn_version(app)
    cur = src.version()
    if cur < 0 or cur <= last:
        return {"mode": "noop", "upstream_version": cur}
    tf = transform if transform is not None else (lambda df: df)
    if last < 0:
        dst.overwrite(tf(src.read(spark, cur)), txn=(app, cur))
        return {"mode": "initial", "upstream_version": cur}
    try:
        delta = src.changes(spark, since_version=last, until_version=cur)
    except NonIncrementalHistory:
        dst.overwrite(tf(src.read(spark, cur)), txn=(app, cur))
        return {"mode": "rebuild", "upstream_version": cur}
    dst.append(tf(delta.drop("_commit_version")), txn=(app, cur))
    return {"mode": "incremental", "upstream_version": cur}
