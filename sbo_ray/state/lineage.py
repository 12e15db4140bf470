"""Checkpointed, resumable execution with per-partition lineage.

North-rule contract: every partition emits lineage records (input shard,
row range, stage hash) and Prometheus-style metrics to a checkpoint
manifest so a killed run resumes from the last committed partition
without recount drift.

Design (SURVEY.md §4 "Checkpoint / resume"):

- The **commit unit is a run**: a deterministic batch of uncommitted
  input shards (``group_size`` at a time). Each run writes its routed
  fragments and unified aggregate *partials* under
  ``out/runs/<run_id>/`` (the run dir is cleared at run start, so a
  crashed run's leftovers are overwritten, never double-counted), then
  appends one commit record per shard to ``manifest.jsonl``.
- ``run_id`` is a content hash of (shard names + config hash) — no
  wall-clock, so a retried run lands in the same directory.
- **Resume** = skip shards already in the manifest; reprocess the rest.
- **No recount drift**: final aggregates are derived only from the
  partials of committed runs; each shard belongs to exactly one
  committed run.
- Counters (rows_in, parse_errors, routed_rows, partial_rows) ride in
  each commit record and are exportable in Prometheus text format.

The reference's only analog is the manual ``StartFrom`` line offset
(``main.go:926-978``); this generalizes it to partitioned batch runs.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from dataclasses import asdict, dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq


@dataclass
class CommitRecord:
    shard: str              # input shard path (the partition id)
    run_id: str
    rows_in: int
    row_range: tuple[int, int] | list  # (first_row_index, last_row_index) within shard
    stage_hash: str         # hash of the transform config (lineage)
    counters: dict = field(default_factory=dict)


class CheckpointManifest:
    """Append-only JSONL commit log + Prometheus-style counter export."""

    def __init__(self, out_dir: str) -> None:
        from .. import fsio

        self._fsio = fsio
        self.out_dir = out_dir
        fsio.makedirs(out_dir)
        self.path = fsio.join(out_dir, "manifest.jsonl")
        self._local = fsio.is_local_path(out_dir)

    def committed_shards(self) -> dict[str, CommitRecord]:
        out: dict[str, CommitRecord] = {}
        if not self._fsio.exists(self.path):
            return out
        with self._fsio.open_file(self.path, "rb") as f:
            raw = f.read()
        lines = raw.splitlines(keepends=True)
        consumed = 0
        for i, bline in enumerate(lines):
            if not bline.endswith(b"\n"):
                # a record is committed only once its NEWLINE landed: a
                # newline-less tail — even if it parses as JSON — is a
                # torn append (the shard reruns, idempotently). Counting
                # it would let the next append merge two records into
                # one unparseable line and silently lose BOTH.
                if i == len(lines) - 1:
                    continue
                raise ValueError("manifest line without newline mid-file")
            line = bline.strip()
            if not line:
                consumed += len(bline)
                continue
            try:
                rec = CommitRecord(**json.loads(line))
            except (json.JSONDecodeError, TypeError, UnicodeDecodeError):
                if i == len(lines) - 1:
                    # torn FINAL record: uncommitted; the READ never
                    # mutates the file (a concurrent writer may still be
                    # appending) — the WRITER repairs in commit().
                    continue
                raise  # torn bytes mid-file: real corruption, surface it
            out[rec.shard] = rec
            consumed += len(bline)
        self._valid_bytes = consumed
        return out

    def committed_run_ids(self) -> set[str]:
        return {r.run_id for r in self.committed_shards().values()}

    def commit(self, records: list[CommitRecord]) -> None:
        """Atomic-enough append: one write+flush+fsync of all records.

        Before appending, the WRITER (which owns the file; one resume per
        out_dir is the contract) truncates a torn tail left by a previous
        crash so its append cannot bury torn bytes mid-file — the repair
        lives on the write path so readers stay side-effect-free.

        Non-local filesystems have no append/truncate: the writer
        re-PUTs the whole manifest (valid bytes + new records) in one
        atomic object write — correct under the same one-writer
        contract, O(manifest) per commit (the manifest is record-sized,
        not data-sized)."""
        payload = "".join(json.dumps(asdict(r)) + "\n" for r in records)
        if self._local:
            _, lpath = self._fsio.resolve(self.path)
            if os.path.exists(lpath):
                self.committed_shards()  # computes _valid_bytes
                valid = getattr(self, "_valid_bytes", None)
                if valid is not None and valid < os.path.getsize(lpath):
                    with open(lpath, "r+b") as f:
                        f.truncate(valid)
            with open(lpath, "a") as f:
                f.write(payload)
                f.flush()
                os.fsync(f.fileno())
            return
        valid_raw = b""
        if self._fsio.exists(self.path):
            self.committed_shards()  # computes _valid_bytes
            with self._fsio.open_file(self.path, "rb") as f:
                valid_raw = f.read()[: getattr(self, "_valid_bytes", 0)]
        with self._fsio.open_file(self.path, "wb") as f:
            f.write(valid_raw + payload.encode())

    def counters_total(self) -> dict[str, int]:
        total: dict[str, int] = {}
        for rec in self.committed_shards().values():
            for k, v in rec.counters.items():
                total[k] = total.get(k, 0) + int(v)
        return total

    def prometheus_text(self) -> str:
        lines = []
        for k, v in sorted(self.counters_total().items()):
            name = f"sbo_ray_{k}_total"
            lines.append(f"# TYPE {name} counter")
            lines.append(f"{name} {v}")
        return "\n".join(lines) + "\n"


def _stage_hash(job) -> str:
    from dataclasses import fields

    def cfg_dict(cfg):
        return {f.name: getattr(cfg, f.name) for f in fields(cfg)}

    blob = json.dumps(
        {
            "default": cfg_dict(job.default),
            "sources": {k: cfg_dict(v) for k, v in sorted(job.sources.items())},
            "engine": "sbo_ray.full_pipeline.v1",
        },
        sort_keys=True, default=str,
    )
    return hashlib.sha1(blob.encode()).hexdigest()[:16]


def _run_id(shards: list[str], stage_hash: str) -> str:
    blob = json.dumps([sorted(os.path.basename(s) for s in shards), stage_hash])
    return hashlib.sha1(blob.encode()).hexdigest()[:12]


class CheckpointedPipeline:
    """Resumable wrapper around the single-pass flagship pipeline."""

    def __init__(self, input_paths: list[str] | str, job, out_dir: str,
                 group_size: int = 8, **pipeline_kwargs) -> None:
        self._input_spec = input_paths  # list of files OR a glob pattern
        self.input_paths = self._resolve_inputs()
        self.job = job
        self.out_dir = out_dir
        self.group_size = group_size
        self.pipeline_kwargs = pipeline_kwargs
        self.manifest = CheckpointManifest(out_dir)
        self.stage_hash = _stage_hash(job)

    def _resolve_inputs(self) -> list[str]:
        if isinstance(self._input_spec, str):
            import glob as g

            return sorted(g.glob(self._input_spec))
        return sorted(self._input_spec)

    def refresh(self) -> int:
        """Follow-mode analog (the reference's fsnotify tail,
        main.go:863-922, re-expressed for batch): re-glob the input spec;
        shards that appeared since the last resolve become pending.
        Returns the number of newly discovered shards."""
        before = set(self.input_paths)
        self.input_paths = self._resolve_inputs()
        return len(set(self.input_paths) - before)

    def follow(self, poll_seconds: float = 5.0, idle_rounds: int = 3) -> None:
        """Poll-process loop: process pending shards, re-glob, repeat;
        stops after ``idle_rounds`` consecutive empty polls."""
        import time as _time

        idle = 0
        while idle < idle_rounds:
            self.run_all()
            if self.refresh() == 0 and not self.pending_shards():
                idle += 1
                _time.sleep(poll_seconds)
            else:
                idle = 0

    def pending_shards(self) -> list[str]:
        done = set(self.manifest.committed_shards())
        return [p for p in self.input_paths if p not in done]

    def run_once(self) -> bool:
        """Process the next group of uncommitted shards; returns True if
        work remains afterwards."""
        from ..pipelines import logpipe

        from .. import fsio

        pending = self.pending_shards()
        if not pending:
            return False
        group = pending[: self.group_size]
        run_id = _run_id(group, self.stage_hash)
        run_dir = fsio.join(self.out_dir, "runs", run_id)
        # a crashed attempt at this run left uncommitted fragments: clear
        fsio.rmtree(run_dir)
        fsio.makedirs(run_dir)

        result = logpipe.full_pipeline(group, self.job, run_dir,
                                       **self.pipeline_kwargs)
        # persist this run's aggregate partials (merged across the group)
        fsio.write_table(run_dir, "metrics_partial.parquet", result["metrics"])
        fsio.write_table(run_dir, "counters_partial.parquet",
                         result["keyed_counters"])
        with fsio.open_file(fsio.join(run_dir, "global_partial.json"), "w") as f:
            json.dump(result["global_counters"], f)

        shard_rows = {p: pq.ParquetFile(p).metadata.num_rows for p in group}
        g = result["global_counters"]
        records = []
        for p in group:
            records.append(CommitRecord(
                shard=p,
                run_id=run_id,
                rows_in=shard_rows[p],
                row_range=[0, shard_rows[p] - 1],
                stage_hash=self.stage_hash,
                counters={
                    # per-run totals attributed once (on the first shard of
                    # the group) so manifest sums equal run sums
                    **({"rows_in_group": sum(shard_rows.values()),
                        "parse_errors": g.get("parse_errors", 0),
                        "requests": g.get("requests", 0)}
                       if p == group[0] else {}),
                    "rows_in": shard_rows[p],
                },
            ))
        self.manifest.commit(records)
        return len(pending) > len(group)

    def run_all(self) -> None:
        while self.run_once():
            pass

    # ---- finalization -----------------------------------------------------
    def finalize(self) -> dict:
        """Merge the partials of every committed run into final tables.
        Derived only from committed runs: a shard contributes exactly
        once, so reruns never drift the counts."""
        from .. import fsio

        run_ids = sorted(self.manifest.committed_run_ids())
        metrics_parts, counter_parts = [], []
        glob: dict[str, int] = {}
        for rid in run_ids:
            run_dir = fsio.join(self.out_dir, "runs", rid)
            with fsio.open_file(
                    fsio.join(run_dir, "metrics_partial.parquet")) as f:
                metrics_parts.append(pq.read_table(f))
            with fsio.open_file(
                    fsio.join(run_dir, "counters_partial.parquet")) as f:
                counter_parts.append(pq.read_table(f))
            with fsio.open_file(
                    fsio.join(run_dir, "global_partial.json"), "r") as f:
                for k, v in json.load(f).items():
                    glob[k] = glob.get(k, 0) + int(v)
        if metrics_parts:
            m = pa.concat_tables(metrics_parts)
            keys = ["source", "metric_type", "key_value", "time_window"]
            metrics = m.group_by(keys).aggregate([("metric_value", "sum")])
            metrics = metrics.rename_columns(keys + ["metric_value"])
            c = pa.concat_tables(counter_parts)
            ckeys = ["source", "dimension", "key_value"]
            counters = c.group_by(ckeys).aggregate([("cnt", "sum")])
            counters = counters.rename_columns(ckeys + ["cnt"])
        else:
            metrics = counters = None
        return {"metrics": metrics, "keyed_counters": counters,
                "global_counters": glob}

    def routed_files(self) -> list[str]:
        from .. import fsio

        out = []
        for rid in sorted(self.manifest.committed_run_ids()):
            routed = fsio.join(self.out_dir, "runs", rid, "routed")
            out.extend(p for p in fsio.listdir(routed)
                       if p.endswith(".parquet"))
        return out
