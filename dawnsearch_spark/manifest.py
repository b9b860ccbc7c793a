"""Per-partition lineage manifests + atomic commit + resume.

Reference analogs:
* periodic checkpoint save of the index file
  (/root/reference/src/bin/dawnsearch.rs:80-88 — 10-minute Save timer;
  /root/reference/src/search/search_provider.rs:173-181 — save impl);
* load-else-rebuild on boot (search_provider.rs:111-120): a missing/corrupt
  artifact is rebuilt from the source of truth — here, a build group whose
  manifest is missing is (re)built from the documents table, committed
  groups are skipped;
* stats counters (search_provider.rs:328-332; served over UDP Announce,
  udp_service.rs:351-363) — here per-group/per-bucket counters
  (docs, postings, terms, bytes).

Commit protocol: artifact directory is fully written first, then the JSON
manifest is written to a temp file and atomically renamed — a manifest's
existence implies its artifact is complete (idempotent resume, ST2 analog).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

MANIFEST_DIR = "_manifests"


def _manifest_path(root: str, name: str) -> str:
    return os.path.join(root, MANIFEST_DIR, f"{name}.json")


def write_manifest(root: str, name: str, payload: dict[str, Any]) -> str:
    """Atomically commit a manifest (tmp write + rename)."""
    os.makedirs(os.path.join(root, MANIFEST_DIR), exist_ok=True)
    path = _manifest_path(root, name)
    payload = dict(payload)
    payload.setdefault("committed_at", time.time())
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    os.replace(tmp, path)
    return path


def read_manifest(root: str, name: str) -> dict[str, Any] | None:
    path = _manifest_path(root, name)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def is_committed(root: str, name: str, fingerprint: str | None = None) -> bool:
    """Committed, and (if given) built under the same config fingerprint —
    a stale checkpoint from a different config is invalidated (ST3 analog:
    liveness expiry becomes config-hash invalidation)."""
    m = read_manifest(root, name)
    if m is None:
        return False
    if fingerprint is not None and m.get("fingerprint") != fingerprint:
        return False
    return True


def list_manifests(root: str) -> dict[str, dict[str, Any]]:
    d = os.path.join(root, MANIFEST_DIR)
    if not os.path.isdir(d):
        return {}
    out = {}
    for fn in sorted(os.listdir(d)):
        if fn.endswith(".json"):
            with open(os.path.join(d, fn)) as f:
                out[fn[:-5]] = json.load(f)
    return out


def dir_bytes(path: str) -> int:
    total = 0
    for dirpath, _dirnames, filenames in os.walk(path):
        for fn in filenames:
            try:
                total += os.path.getsize(os.path.join(dirpath, fn))
            except OSError:
                pass
    return total


def config_fingerprint(cfg) -> str:
    """Stable hash of the index-layout-affecting config fields."""
    import hashlib

    relevant = {
        # v5: segment rows carry tf_sum (dictionary rebuildable from
        # segment metadata -> runs/ GC-able). v4: stats-free rows
        # (per-block Pareto fronts of (tf, dl); df = Σ n_docs) + tiered
        # generations. Older layouts rebuild.
        "layout_version": 5,
        "k1": cfg.k1,
        "b": cfg.b,
        "num_term_buckets": cfg.num_term_buckets,
        "range_size": cfg.range_size,
        "block_size": cfg.block_size,
        "heavy_df_threshold": cfg.heavy_df_threshold,
        "heavy_df_ratio": cfg.heavy_df_ratio,
        "heavy_df_min": cfg.heavy_df_min,
        "heavy_df_max": cfg.heavy_df_max,
        "id_cols": list(cfg.id_cols),
    }
    return hashlib.sha256(json.dumps(relevant, sort_keys=True).encode()).hexdigest()[:16]
