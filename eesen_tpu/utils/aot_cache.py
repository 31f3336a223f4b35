"""Ahead-of-time executable cache for jitted programs.

The axon TPU platform compiles through a remote service that bypasses
jax's persistent compilation cache, so every process pays full compile
cost (~minutes for the first beam-search-shaped program).  For workflows
with a hard wall-clock budget (bench.py under the driver's timeout), we
compile ONCE in a prep pass, serialize the executable with
`jax.experimental.serialize_executable`, and deserialize it in later
processes (~0.1 s instead of minutes; measured on TPU v5e).

Entries are keyed by a caller-supplied fingerprint covering everything
that must match for the cached executable to be valid: jax version,
backend, argument shapes/dtypes, config reprs, and a content hash of the
source modules that define the computation.  A mismatched fingerprint is
simply a cache miss — callers fall back to a live compile.

The reference has no analogue (its binaries are AOT-compiled C++ by
definition); this is TPU-runtime plumbing.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import stat
import tempfile
from typing import Any, Callable, Optional, Sequence

import jax

# user-scoped cache dir: pickle.load on attacker-controlled bytes is code
# execution, so the cache must not live at a predictable world-writable
# path another local user could pre-plant files in.
DEFAULT_DIR = os.path.join(
    tempfile.gettempdir(), f"eesen_aot_{os.getuid()}"
)


def _owned_by_us(path: str) -> bool:
    """True iff `path` exists, is owned by our uid, and (for dirs) is not
    writable by group/other."""
    try:
        st = os.stat(path)
    except OSError:
        return False
    if st.st_uid != os.getuid():
        return False
    if stat.S_ISDIR(st.st_mode) and (st.st_mode & (stat.S_IWGRP | stat.S_IWOTH)):
        return False
    return True


def source_hash(modules: Sequence[Any]) -> str:
    """Content hash of the given modules' source files."""
    h = hashlib.sha256()
    for m in modules:
        path = getattr(m, "__file__", None)
        if path and os.path.exists(path):
            with open(path, "rb") as f:
                h.update(f.read())
        h.update(b"|")
    return h.hexdigest()[:16]


def fingerprint(*parts: Any) -> str:
    """Stable key from arbitrary repr-able parts + jax version/backend."""
    h = hashlib.sha256()
    h.update(jax.__version__.encode())
    h.update(jax.default_backend().encode())
    for p in parts:
        h.update(repr(p).encode())
        h.update(b"|")
    return h.hexdigest()[:20]


def _path(name: str, fp: str, cache_dir: str) -> str:
    return os.path.join(cache_dir, f"{name}_{fp}.aotx")


def save(name: str, fp: str, compiled, cache_dir: str = DEFAULT_DIR) -> str:
    """Serialize a jax Compiled to the cache; returns the path."""
    from jax.experimental.serialize_executable import serialize

    payload, in_tree, out_tree = serialize(compiled)
    os.makedirs(cache_dir, mode=0o700, exist_ok=True)
    path = _path(name, fp, cache_dir)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump((payload, in_tree, out_tree), f)
    os.replace(tmp, path)
    return path


def load(name: str, fp: str, cache_dir: str = DEFAULT_DIR):
    """Deserialize a cached executable, or None on any miss/failure."""
    path = _path(name, fp, cache_dir)
    if not os.path.exists(path):
        return None
    # never unpickle from a dir/file we don't own (local pre-plant attack)
    if not (_owned_by_us(cache_dir) and _owned_by_us(path)):
        return None
    try:
        from jax.experimental.serialize_executable import (
            deserialize_and_load,
        )

        with open(path, "rb") as f:
            payload, in_tree, out_tree = pickle.load(f)
        return deserialize_and_load(payload, in_tree, out_tree)
    except Exception:  # noqa: BLE001 - any failure is just a cache miss
        return None


def compile_and_save(
    name: str,
    fp: str,
    jitted: Callable,
    args: tuple,
    cache_dir: str = DEFAULT_DIR,
):
    """Lower+compile `jitted` for `args`, cache it, return the Compiled."""
    compiled = jitted.lower(*args).compile()
    save(name, fp, compiled, cache_dir)
    return compiled


def load_or_compile(
    name: str,
    fp: str,
    jitted: Optional[Callable],
    args: tuple,
    cache_dir: str = DEFAULT_DIR,
    save_on_miss: bool = True,
):
    """(compiled, was_cached).  jitted=None forbids the live-compile
    fallback (returns (None, False) on miss)."""
    c = load(name, fp, cache_dir)
    if c is not None:
        return c, True
    if jitted is None:
        return None, False
    if save_on_miss:
        return compile_and_save(name, fp, jitted, args, cache_dir), False
    return jitted.lower(*args).compile(), False
