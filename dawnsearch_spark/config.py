"""Engine configuration.

Reference analog: ``Config`` loaded from TOML + env with env taking
precedence (/root/reference/src/config.rs:22-73). The reference has no BM25
constants (it is an embedding engine; its hardcoded internal k is 20 at
src/search/search_provider.rs:214 and the example CLIs display top-10 at
examples_old/search.rs:55-63); k1/b/top_k here are OUR pinned constants,
enforced by the exact-scan oracle (BASELINE.md).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, fields, replace

try:  # python >= 3.11
    import tomllib
except ImportError:  # pragma: no cover
    tomllib = None


@dataclass(frozen=True)
class EngineConfig:
    # --- BM25 scoring (pinned; see BASELINE.md) ---
    k1: float = 1.2
    b: float = 0.75
    top_k: int = 10
    # Internal over-fetch at the partition level, mirroring the reference's
    # internal k=20 vs displayed 10 (search_provider.rs:214).
    top_k_internal: int = 20

    # --- index layout ---
    # Number of term-hash buckets the final segments are partitioned by
    # (partition pruning unit for query-term lookups).
    num_term_buckets: int = 32
    # Docs per doc-range; heavy-term posting rows are chunked per range so a
    # single query task never touches more than one range of a heavy list.
    range_size: int = 65536
    # Postings per block inside a posting row (block-max WAND skip unit).
    block_size: int = 128

    # --- skew handling (north_rule: salted groupBy-term) ---
    # A term whose df exceeds this is "heavy" (stopword-like) and its
    # stage-1 shuffle is salted into `num_salts` sub-groups.
    heavy_df_threshold: int = 100_000
    num_salts: int = 16

    # --- build ---
    # Stage-1 shuffle partitions for the posting-run build.
    build_partitions: int = 32
    # Columns that define document identity / deterministic docID order.
    id_cols: tuple[str, ...] = ("repo", "path", "commit")
    content_col: str = "content"

    # --- checkpoint / resume ---
    checkpoint_dir: str = ""

    # --- misc ---
    snippet_len: int = 500  # serve-time snippet truncation (web.rs:328 analog)

    def scaled_for_tests(self) -> "EngineConfig":
        """Small-corpus variant: tiny ranges/thresholds so the heavy-term,
        multi-range and multi-block code paths are exercised at unit scale."""
        return replace(
            self,
            range_size=64,
            block_size=8,
            heavy_df_threshold=32,
            num_salts=4,
            num_term_buckets=8,
            build_partitions=8,
        )


_ENV_PREFIX = "DAWNSEARCH_SPARK_"


def load_config(toml_path: str | None = None) -> EngineConfig:
    """TOML file < environment variables, mirroring the reference's
    load precedence (config.rs:42-73: file then env overrides)."""
    values: dict[str, object] = {}
    if toml_path and tomllib is not None and os.path.exists(toml_path):
        with open(toml_path, "rb") as f:
            data = tomllib.load(f)
        values.update(data.get("engine", data))
    for f in fields(EngineConfig):
        env_key = _ENV_PREFIX + f.name.upper()
        if env_key in os.environ:
            raw = os.environ[env_key]
            if f.type in ("int", int):
                values[f.name] = int(raw)
            elif f.type in ("float", float):
                values[f.name] = float(raw)
            elif f.name == "id_cols":
                values[f.name] = tuple(raw.split(","))
            else:
                values[f.name] = raw
    known = {f.name for f in fields(EngineConfig)}
    values = {k: v for k, v in values.items() if k in known}
    if "id_cols" in values and not isinstance(values["id_cols"], tuple):
        values["id_cols"] = tuple(values["id_cols"])
    return EngineConfig(**values)  # type: ignore[arg-type]
