"""Measure the manifest-log cost at the 100 TB design point's file
counts: commit + snapshot-read cost of the OLD full-snapshot JSON log
vs the round-11 delta + parquet-checkpoint log, on synthetic manifests
of N files with per-file stats and bloom bitsets (the inline-metadata
shape the round-10 audit flagged as the one remaining 100x ceiling).

Usage: python tools/bench_manifest.py [n_files ...]
Prints one line per N; numbers go to SCALE.md."""

from __future__ import annotations

import base64
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from maillogsentinel_spark.sources import txstore  # noqa: E402


def _synth_state(n_files: int, version: int = 50) -> dict:
    files: dict[str, list[str]] = {}
    stats, blooms = {}, {}
    bits = base64.b64encode(bytes(1024)).decode("ascii")  # 8192-bit bloom
    for i in range(n_files):
        day = f"2025-03-{(i % 28) + 1:02d}"
        rel = f"event_date={day}/tx{i:08x}-part-0000.parquet"
        files.setdefault(day, []).append(rel)
        stats[rel] = {
            "event_id": [i * 100, i * 100 + 99],
            "user_id": [0, 500],
            "value": [0.0, 123.456],
        }
        blooms[rel] = {"tag": {"m": 8192, "k": 6, "bits": bits}}
    for v in files.values():
        v.sort()
    return {
        "format": "mls-tx-v1",
        "version": version,
        "parent": version - 1,
        "txid": "bench" + "0" * 27,
        "operation": "append",
        "schema": json.dumps({"type": "struct", "fields": []}),
        "files": files,
        "stats": stats,
        "blooms": blooms,
        "dv": {},
    }


def _one_file_append(prev: dict) -> dict:
    day = "2025-03-01"
    rel = f"event_date={day}/txnew00-part-0000.parquet"
    files = {d: list(v) for d, v in prev["files"].items()}
    files[day] = sorted(files[day] + [rel])
    stats = dict(prev["stats"])
    stats[rel] = {"event_id": [0, 9], "user_id": [0, 5], "value": [0.0, 1.0]}
    return dict(
        prev,
        version=prev["version"] + 1,
        parent=prev["version"],
        txid="benchnew" + "0" * 24,
        files=files,
        stats=stats,
        blooms=dict(prev["blooms"]),
    )


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [1_000, 10_000, 100_000]
    for n in ns:
        prev = _synth_state(n)
        nxt = _one_file_append(prev)
        with tempfile.TemporaryDirectory() as tmp:
            # OLD log: full-snapshot JSON per commit (serialize + write),
            # full parse per read
            t0 = time.perf_counter()
            full_doc = json.dumps(nxt, sort_keys=True)
            with open(f"{tmp}/full.json", "w") as f:
                f.write(full_doc)
            t_full_commit = time.perf_counter() - t0
            t0 = time.perf_counter()
            with open(f"{tmp}/full.json") as f:
                json.loads(f.read())
            t_full_read = time.perf_counter() - t0

            # NEW log: delta JSON per commit
            t0 = time.perf_counter()
            delta = txstore._delta_doc(prev, nxt)
            if txstore._apply_delta(prev, delta) != nxt:
                raise RuntimeError("delta round-trip mismatch")
            with open(f"{tmp}/delta.json", "w") as f:
                f.write(json.dumps(delta, sort_keys=True))
            t_delta_commit = time.perf_counter() - t0

            # checkpoint write (every _CKPT_INTERVAL-th commit) + read
            os.makedirs(f"{tmp}/store/_manifests")
            t0 = time.perf_counter()
            txstore._write_ckpt(f"{tmp}/store", nxt)
            t_ckpt_write = time.perf_counter() - t0
            t0 = time.perf_counter()
            got = txstore._read_ckpt(f"{tmp}/store", nxt["version"])
            t_ckpt_read = time.perf_counter() - t0
            if got != nxt:
                raise RuntimeError("checkpoint round-trip mismatch")
            ckpt_bytes = os.path.getsize(
                txstore._ckpt_path(f"{tmp}/store", nxt["version"])
            )
            delta_bytes = os.path.getsize(f"{tmp}/delta.json")
            full_bytes = os.path.getsize(f"{tmp}/full.json")
            # round-11 metadata-only schema/table ops at the same N:
            # RENAME COLUMN = a delta whose only payload is the schema
            # scalar; SHALLOW CLONE = ONE v1 manifest carrying the file
            # list + O(files) ext map
            renamed = dict(
                nxt,
                version=nxt["version"] + 1,
                parent=nxt["version"],
                txid="benchren" + "0" * 24,
                operation="rename_column",
                schema=json.dumps({"type": "struct", "fields": [
                    {"name": "value", "type": "double", "nullable": True,
                     "metadata": {"cm_logical": "score"}}]}),
            )
            t0 = time.perf_counter()
            rd = txstore._delta_doc(nxt, renamed)
            if txstore._apply_delta(nxt, rd) != renamed:
                raise RuntimeError("rename delta round-trip mismatch")
            rename_doc = json.dumps(rd, sort_keys=True)
            t_rename = time.perf_counter() - t0

            ext = {
                rel: "/elsewhere/src/data"
                for rels in nxt["files"].values() for rel in rels
            }
            clone_m = dict(
                nxt, version=1, parent=0, operation="clone", ext=ext,
                txid="benchcln" + "0" * 24,
            )
            t0 = time.perf_counter()
            clone_doc = json.dumps(clone_m, sort_keys=True)
            with open(f"{tmp}/clone.json", "w") as f:
                f.write(clone_doc)
            t_clone = time.perf_counter() - t0

        amortized = t_delta_commit + t_ckpt_write / txstore._CKPT_INTERVAL
        print(
            json.dumps(
                {
                    "n_files": n,
                    "full_json_bytes": full_bytes,
                    "delta_json_bytes": delta_bytes,
                    "ckpt_parquet_bytes": ckpt_bytes,
                    "old_commit_sec": round(t_full_commit, 4),
                    "old_read_sec": round(t_full_read, 4),
                    "new_commit_sec": round(t_delta_commit, 5),
                    "new_commit_amortized_sec": round(amortized, 4),
                    "ckpt_write_sec": round(t_ckpt_write, 4),
                    "ckpt_read_sec": round(t_ckpt_read, 4),
                    "rename_commit_sec": round(t_rename, 5),
                    "rename_doc_bytes": len(rename_doc),
                    "clone_commit_sec": round(t_clone, 4),
                    "clone_json_bytes": len(clone_doc),
                }
            )
        )


if __name__ == "__main__":
    main()
