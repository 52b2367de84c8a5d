"""Offline ``hf://`` dataset reader (public Hub layout, no network).

The reference reads Hugging Face datasets directly by URL
(docs/file-formats-reference.md:158-183) through its engine's httpfs.
Spark has no ``hf://`` filesystem and this runtime has no network, so —
exactly like tables/delta_log.py made Delta real from the public
transaction-log spec — this module makes ``hf://`` real from the two
PUBLIC Hub conventions:

1. **URL grammar** (the same one huggingface_hub's HfFileSystem and
   DuckDB's hf extension speak)::

       hf://datasets/{org}/{name}[@{revision}]/{path_in_repo}
       hf://{org}/{name}            (dataset shorthand)

2. **Local snapshot cache layout** (huggingface_hub's disk format —
   what ``snapshot_download`` / ``HF_HUB_CACHE`` produce)::

       {cache}/datasets--{org}--{name}/
           refs/{branch}            -> file containing the commit hash
           snapshots/{commit}/...   -> the repo tree at that commit

   with data files laid out per the Hub's parquet convention:
   ``{config}/{split}-{i:05d}-of-{n:05d}.parquet`` (or a flat
   ``data/`` directory), csv/json fallbacks with the same stem.

``read_hf_dataset`` resolves the URL against the local cache
(``HF_HUB_CACHE`` / ``HF_HOME`` / ``~/.cache/huggingface/hub``, the
public huggingface_hub environment variables), discovers the shard
files for the requested config/split, and hands the FILE LIST to the
ordinary distributed readers — so pushdown/pruning behave exactly as
for any parquet directory. A repo that is not in the cache still fails
loud with the snapshot_download recipe: this is an OFFLINE resolver,
not a downloader.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

_SHARD_RE = re.compile(
    r"^(?P<split>[A-Za-z0-9_.]+?)(?:-\d{5}-of-\d{5})?\.(?P<ext>parquet|csv|json|jsonl)$"
)


@dataclass
class HfUrl:
    repo_type: str  # "datasets" (models/spaces parse but are rejected for reads)
    org: str
    name: str
    revision: str | None
    path_in_repo: str | None

    @property
    def repo_id(self) -> str:
        return f"{self.org}/{self.name}"


def parse_hf_url(url: str) -> HfUrl:
    """Parse the public ``hf://`` grammar (see module docstring)."""
    if not url.startswith("hf://"):
        raise ValueError(f"not an hf:// URL: {url}")
    rest = url[len("hf://") :]
    parts = rest.split("/")
    if parts and parts[0] in ("datasets", "models", "spaces"):
        repo_type, parts = parts[0], parts[1:]
    else:
        repo_type = "datasets"  # the reference's hf://user/dataset shorthand
    if len(parts) < 2 or not parts[0] or not parts[1]:
        raise ValueError(f"hf:// URL needs org/name: {url}")
    org, name_rev = parts[0], parts[1]
    name, _, revision = name_rev.partition("@")
    path_in_repo = "/".join(parts[2:]) or None
    return HfUrl(repo_type, org, name, revision or None, path_in_repo)


def hub_cache_dir(cache_dir: str | None = None) -> str:
    """The huggingface_hub cache root (public env-var precedence)."""
    if cache_dir:
        return cache_dir
    if os.environ.get("HF_HUB_CACHE"):
        return os.environ["HF_HUB_CACHE"]
    if os.environ.get("HF_HOME"):
        return os.path.join(os.environ["HF_HOME"], "hub")
    return os.path.expanduser("~/.cache/huggingface/hub")


def resolve_local_snapshot(u: HfUrl, cache_dir: str | None = None) -> str:
    """Local snapshot directory for the URL's revision, or a loud
    FileNotFoundError with the download recipe."""
    root = os.path.join(
        hub_cache_dir(cache_dir), f"{u.repo_type}--{u.org}--{u.name}"
    )
    if not os.path.isdir(root):
        raise FileNotFoundError(
            f"no local snapshot of {u.repo_type}/{u.repo_id} under "
            f"{hub_cache_dir(cache_dir)!r}; on a connected machine run "
            "huggingface_hub.snapshot_download(repo_id="
            f"{u.repo_id!r}, repo_type='dataset') (or set HF_HUB_CACHE "
            "to a shared object-store mount), then re-run"
        )
    rev = u.revision or "main"
    ref_file = os.path.join(root, "refs", rev)
    if os.path.isfile(ref_file):
        with open(ref_file) as fh:
            rev = fh.read().strip()
    snap = os.path.join(root, "snapshots", rev)
    if not os.path.isdir(snap):
        have = sorted(os.listdir(os.path.join(root, "snapshots")))
        raise FileNotFoundError(
            f"revision {rev!r} of {u.repo_id} not in the local cache "
            f"(snapshots present: {have})"
        )
    return snap


def discover_shards(snapshot_dir: str) -> list[dict]:
    """Walk a snapshot tree for data shards, classifying each by the
    Hub parquet convention: ``{config}/{split}-NNNNN-of-NNNNN.ext``
    (top-level and ``data/`` directories map to config 'default')."""
    out = []
    for dirpath, _dirs, files in os.walk(snapshot_dir):
        rel_dir = os.path.relpath(dirpath, snapshot_dir)
        if rel_dir.startswith(".") and rel_dir != ".":
            continue  # .gitattributes/.cache trees
        config = (
            "default"
            if rel_dir in (".", "data")
            else rel_dir.replace(os.sep, "/")
        )
        for name in sorted(files):
            m = _SHARD_RE.match(name)
            if not m:
                continue
            out.append(
                {
                    "path": os.path.join(dirpath, name),
                    "config": config,
                    "split": m.group("split"),
                    "format": "json" if m.group("ext") == "jsonl" else m.group("ext"),
                }
            )
    return out


def read_hf_dataset(
    spark: SparkSession,
    url: str,
    config: str | None = None,
    split: str | None = None,
    cache_dir: str | None = None,
    **options,
) -> DataFrame:
    """Read an ``hf://`` dataset from the local snapshot cache.

    - an explicit ``path_in_repo`` in the URL reads exactly that file
      or glob (format by extension);
    - otherwise shards are discovered by convention and filtered by
      ``config`` / ``split`` (both default to "everything that's
      there", erroring if formats mix).

    The shard list goes to the plain distributed readers — at cluster
    scale point ``cache_dir`` at the object-store mirror of the
    snapshot and every executor reads its own byte ranges.
    """
    from pg_datalake_spark.sources.readers import read_files

    u = parse_hf_url(url)
    if u.repo_type != "datasets":
        raise ValueError(f"only hf://datasets/... is readable, got {u.repo_type}")
    snap = resolve_local_snapshot(u, cache_dir)
    if u.path_in_repo:
        return read_files(spark, os.path.join(snap, u.path_in_repo), **options)
    shards = discover_shards(snap)
    if config is not None:
        shards = [s for s in shards if s["config"] == config]
    if split is not None:
        shards = [s for s in shards if s["split"] == split]
    if not shards:
        raise FileNotFoundError(
            f"no data shards for config={config!r} split={split!r} in {snap} "
            f"(found: {sorted({(s['config'], s['split']) for s in discover_shards(snap)})})"
        )
    fmts = sorted({s["format"] for s in shards})
    if len(fmts) > 1:
        raise ValueError(
            f"mixed shard formats {fmts}; pass config/split to disambiguate"
        )
    paths = [s["path"] for s in shards]
    if fmts[0] == "parquet":
        return spark.read.options(**{k: str(v) for k, v in options.items()}).parquet(
            *paths
        )
    if fmts[0] == "json":
        return spark.read.options(**{k: str(v) for k, v in options.items()}).json(paths)
    return (
        spark.read.options(
            **{"header": "true", "inferSchema": "true"}
            | {k: str(v) for k, v in options.items()}
        ).csv(paths)
    )
