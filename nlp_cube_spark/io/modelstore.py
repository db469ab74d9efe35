"""Model/kernel-artifact store: catalog -> verified local path -> executors.

Plays the role of the reference's ModelStore (cube/io_utils/modelstore.py:
9-132 — catalog.json lookup, latest-version resolution, download/unpack,
local cache), re-expressed for a Spark deployment:

- the catalog maps (name, version) to an artifact path/URI + sha256; the
  'latest' resolution rule matches the reference (highest numeric version,
  modelstore.py:54-66);
- `resolve` verifies integrity (sha256 — the reference trusts transport;
  at cluster scale silent object-store corruption is a real failure) and
  returns a local path, fetching into a cache dir when the source is
  remote (urllib streaming, split-archive concatenation like the
  reference's model.zip.001 downloads; pinned sha REQUIRED for anything
  remote, and file:// exercises the same path offline in tests);
- `ship` registers the artifact with SparkContext.addFile so every
  executor's python worker resolves it via SparkFiles.get — the
  distributed analog of the reference unpacking into ~/.nlpcube (driver
  downloads once; the cluster manager fans the file out, instead of every
  node hitting the model host).

The packaged micro-parser weights are the first catalog entry; kernels
load through `resolve`, so swapping pinned weights = one catalog edit.
"""

from __future__ import annotations

import hashlib
import json
import os

_PKG_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# name -> version -> {"path": local-or-remote, "sha256": hex}
# Local catalog (packaged artifacts). A deployment overrides/extends via
# register() or a catalog.json next to the cache dir.
# Digests are COMMITTED (scripts/train_micro_* regenerate them and print the
# new digest) so packaged artifacts are verified from the very first
# resolve — no trust-on-first-use window. register() entries may still pass
# sha256=None to pin lazily (e.g. a user's own local artifact).
_CATALOG: dict[str, dict[str, dict]] = {
    "micro_parser": {
        "1.0": {
            "path": os.path.join(_PKG_DIR, "kernels", "micro_parser_weights.json"),
            "sha256": "0ac8f60eb31339b518e5bac00b6e51b226d2403a54160f3fea87e5cc8e6ed416",
        }
    },
    "micro_tagger": {
        "1.0": {
            "path": os.path.join(_PKG_DIR, "kernels", "micro_tagger_weights.json"),
            "sha256": "44c67a6d8227dc4aa78b9fc4da4709e6a8d497d27cb7e8fcd6cc8ac448c12db2",
        }
    },
    "micro_boundary": {
        "1.0": {
            "path": os.path.join(_PKG_DIR, "kernels", "micro_boundary_weights.json"),
            "sha256": "aef6e81a68c024cf51f71f623ed9d7dab54f9e9c068dc1d4df294e9a8ec01bbc",
        }
    },
    "micro_embeddings": {
        "1.0": {
            "path": os.path.join(_PKG_DIR, "kernels", "micro_embeddings.json"),
            "sha256": "7d4023e7cdc26e6fb7016db4c1b53852b37c73eeb1214e91ec53be7c23eefa01",
        }
    },
    "micro_lemmatizer": {
        "1.0": {
            "path": os.path.join(_PKG_DIR, "kernels", "micro_lemmatizer_weights.json"),
            "sha256": "2b79a0930da74e1c5b44412bedaf8353238f10dfa56414335ea279d5d5b685d4",
        }
    },
    "micro_lemma_transducer": {
        "1.0": {
            "path": os.path.join(_PKG_DIR, "kernels", "micro_lemma_transducer.json"),
            "sha256": "21769cfc6eb2a7b885923fa2b699a5e56920653f1d06e261dcfa292c6b4ae713",
        }
    },
    "micro_mwt_transducer": {
        "1.0": {
            "path": os.path.join(_PKG_DIR, "kernels", "micro_mwt_transducer.json"),
            "sha256": "a6ea8da95fff6716d2f898d2f5e611203b6e2fe1d539fc3c0243a1f1d8b250f1",
        }
    },
    "micro_mwt": {
        "1.0": {
            "path": os.path.join(_PKG_DIR, "kernels", "micro_mwt_weights.json"),
            "sha256": "9cde5aca84f8b33242821cb2526c300c4c27de424e6010e7624ca460faf4bf68",
        }
    },
    "micro_wordgram": {
        "1.0": {
            "path": os.path.join(_PKG_DIR, "kernels", "micro_wordgram_vectors.json"),
            "sha256": "7e24dd6a3108d3991f76515d7a73c55ae5fa8d1ddcb7aae9eff4469af8db453c",
        }
    },
}


def register(
    name: str,
    version: str,
    path: str,
    sha256: str | None = None,
    parts: list[str] | None = None,
) -> None:
    """`parts`: ordered URI list for split archives (the reference's
    model.zip.001... download shape, modelstore.py:67-103) — fetched and
    CONCATENATED into one local artifact; `path` then only names the
    cache file. Remote entries (path or parts with a scheme) REQUIRE a
    pinned sha256."""
    _CATALOG.setdefault(name, {})[version] = {
        "path": path, "sha256": sha256, **({"parts": parts} if parts else {}),
    }


#: Network stall / runaway-download guards for _fetch_concat. The sha
#: check only runs after the full download, so the size cap is the only
#: thing bounding a misbehaving endpoint that streams forever.
FETCH_TIMEOUT_SEC = 60
FETCH_MAX_BYTES = 8 << 30  # 8 GiB — generous for any split-archive model


def _fetch_concat(uris: list[str], dest: str, max_bytes: int = FETCH_MAX_BYTES) -> None:
    """Stream one or more URIs into a single local file (split archives
    concatenate in order — reference ModelStore download shape). urllib
    handles file:// (testable offline) and http(s):// with the same code;
    the write is tmp-then-rename so a crashed fetch never half-populates
    the cache. A per-connection timeout and a total size cap keep a
    stalled or runaway remote from hanging resolve() on the driver."""
    from urllib.request import urlopen

    os.makedirs(os.path.dirname(dest), exist_ok=True)
    tmp = dest + ".part"
    total = 0
    try:
        with open(tmp, "wb") as f:
            for uri in uris:
                with urlopen(uri, timeout=FETCH_TIMEOUT_SEC) as r:
                    while True:
                        chunk = r.read(1 << 20)
                        if not chunk:
                            break
                        total += len(chunk)
                        if total > max_bytes:
                            raise ValueError(
                                f"fetch exceeded max_bytes={max_bytes} "
                                f"({total} bytes so far from {uri})"
                            )
                        f.write(chunk)
    except BaseException:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise
    os.replace(tmp, dest)


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def latest_version(name: str) -> str:
    """Highest numeric version (reference modelstore.py:54-66)."""
    entries = _CATALOG.get(name)
    if not entries:
        raise KeyError(f"model '{name}' not in catalog")
    return max(entries, key=lambda v: float(v))


def resolve(name: str, version: str = "latest", cache_dir: str | None = None) -> str:
    """Catalog entry -> verified LOCAL path (reference ModelStore.solve).

    Local artifacts are verified in place; remote URIs (and split-archive
    `parts` lists, the reference's download shape) are fetched into
    cache_dir once via urllib — file:// exercises the identical code path
    offline; http(s):// works wherever the deployment has network — then
    sha-verified against the REQUIRED pinned digest. A mismatching fetch
    is deleted from the cache before raising."""
    version = latest_version(name) if version == "latest" else version
    try:
        entry = _CATALOG[name][version]
    except KeyError:
        raise KeyError(f"model '{name}' version '{version}' not in catalog") from None
    path = entry["path"]
    parts = entry.get("parts")
    fetched = False
    if "://" in path or parts:
        if entry.get("sha256") is None:
            raise ValueError(
                f"remote artifact {name} {version} must register() a pinned "
                "sha256 — trust-on-first-use is only allowed for local files"
            )
        cache_dir = cache_dir or os.path.join(os.path.expanduser("~"), ".nlp_cube_spark")
        local = os.path.join(cache_dir, f"{name}.{version}", os.path.basename(path))
        if not os.path.exists(local):
            _fetch_concat(parts or [path], local)
            fetched = True
        path = local
    if not os.path.exists(path):
        raise FileNotFoundError(f"artifact missing: {path}")
    digest = _sha256(path)
    remote = "://" in entry["path"] or bool(parts)
    if remote and entry.get("sha256") not in (None, digest):
        # evict ANY mismatching cached copy, not just one fetched this
        # call — a stale cache after re-registration (new content, new
        # pinned sha) would otherwise brick the entry forever, since
        # os.path.exists(local) short-circuits the re-fetch
        os.remove(path)
        if not fetched:  # stale pre-existing cache: re-fetch once
            _fetch_concat(parts or [entry["path"]], path)
            digest = _sha256(path)
            if digest != entry["sha256"]:
                os.remove(path)
    if entry.get("sha256") is None:
        if path.endswith((".pt", ".pth")):
            # torch checkpoints are pickle-bearing: lazy trust-on-first-use
            # pinning would let a tampered artifact self-certify. Require an
            # out-of-band digest (kernels/learned.py loads weights_only, but
            # defense-in-depth for torch <2.6 deployments).
            raise ValueError(
                f"torch artifact {name} {version} must register() a pinned "
                "sha256 (lazy pinning is only allowed for non-pickle formats)"
            )
        entry["sha256"] = digest  # pin packaged files on first resolve
    elif digest != entry["sha256"]:
        raise ValueError(
            f"sha256 mismatch for {name} {version}: got {digest}, want {entry['sha256']}"
        )
    return path


def ship(spark, name: str, version: str = "latest") -> str:
    """Register the artifact with the cluster: driver resolves + verifies,
    SparkContext.addFile fans it out, executors read it back with
    SparkFiles.get(basename). Returns the basename executors should use."""
    path = resolve(name, version)
    spark.sparkContext.addFile(path)
    return os.path.basename(path)


def executor_path(basename: str) -> str:
    """Inside a task/python worker: local path of a shipped artifact."""
    from pyspark import SparkFiles

    p = SparkFiles.get(basename)
    if os.path.exists(p):
        return p
    # driver-local mode, or artifact packaged with the code
    fallback = os.path.join(_PKG_DIR, "kernels", basename)
    if os.path.exists(fallback):
        return fallback
    raise FileNotFoundError(f"shipped artifact not found: {basename}")


def load_json(name: str, version: str = "latest") -> dict:
    with open(resolve(name, version)) as f:
        return json.load(f)
