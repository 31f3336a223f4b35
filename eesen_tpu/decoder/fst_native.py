"""ctypes bridge to the native WFST library (csrc/fstlib.cpp).

Builds the shared library on demand with g++ (cached next to the source)
and exposes the same API as eesen_tpu.decoder.fst, operating on `Fst`
objects through a flat serialized buffer.  Falls back to the pure-Python
implementations if no compiler is available.

Use `native_available()` to check, and the `compose/determinize_star/
minimize_encoded/rm_epsilon/connect` functions — they dispatch to C++ when
possible.  Cross-validated against the Python versions by
tests/test_fst_native.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from eesen_tpu.decoder import fst as pyfst
from eesen_tpu.utils.logging import get_logger

log = get_logger("decoder.fst_native")

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "csrc", "fstlib.cpp",
)
_LIB_PATH = os.path.join(os.path.dirname(_SRC), "libfstlib.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    if os.path.exists(_LIB_PATH) and (
        os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)
    ):
        return _LIB_PATH
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", _SRC,
             "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=300,
        )
        return _LIB_PATH
    except Exception as e:  # pragma: no cover - depends on toolchain
        log.warning("fstlib build failed (%s); using pure-Python FST ops", e)
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.fstlib_run.argtypes = [
            ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.fstlib_run.restype = ctypes.c_int
        lib.fstlib_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
        if hasattr(lib, "fstlib_compile_graph"):
            lib.fstlib_compile_graph.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.POINTER(ctypes.c_size_t),
            ]
            lib.fstlib_compile_graph.restype = ctypes.c_int
        _lib = lib
        return _lib


def native_available() -> bool:
    return _get_lib() is not None


# ---- serialization ----

def pack_fst(f: pyfst.Fst) -> bytes:
    n = f.num_states
    srcs, ils, ols, ws, dsts = [], [], [], [], []
    for s in range(n):
        for a in f.arcs[s]:
            srcs.append(s); ils.append(a.ilabel); ols.append(a.olabel)
            ws.append(a.weight); dsts.append(a.nextstate)
    fin = sorted(f.finals.items())
    parts = [
        np.asarray([n, f.start, len(srcs)], dtype=np.int64).tobytes(),
        np.asarray(srcs, dtype=np.int32).tobytes(),
        np.asarray(ils, dtype=np.int32).tobytes(),
        np.asarray(ols, dtype=np.int32).tobytes(),
        np.asarray(ws, dtype=np.float32).tobytes(),
        np.asarray(dsts, dtype=np.int32).tobytes(),
        np.asarray([len(fin)], dtype=np.int64).tobytes(),
        np.asarray([s for s, _ in fin], dtype=np.int32).tobytes(),
        np.asarray([w for _, w in fin], dtype=np.float32).tobytes(),
    ]
    return b"".join(parts)


def unpack_fst(buf: bytes) -> pyfst.Fst:
    off = 0
    hdr = np.frombuffer(buf, dtype=np.int64, count=3, offset=off)
    off += 24
    n_states, start, n_arcs = (int(x) for x in hdr)
    srcs = np.frombuffer(buf, np.int32, n_arcs, off); off += 4 * n_arcs
    ils = np.frombuffer(buf, np.int32, n_arcs, off); off += 4 * n_arcs
    ols = np.frombuffer(buf, np.int32, n_arcs, off); off += 4 * n_arcs
    ws = np.frombuffer(buf, np.float32, n_arcs, off); off += 4 * n_arcs
    dsts = np.frombuffer(buf, np.int32, n_arcs, off); off += 4 * n_arcs
    n_fin = int(np.frombuffer(buf, np.int64, 1, off)[0]); off += 8
    fs = np.frombuffer(buf, np.int32, n_fin, off); off += 4 * n_fin
    fw = np.frombuffer(buf, np.float32, n_fin, off)
    f = pyfst.Fst()
    for _ in range(n_states):
        f.add_state()
    f.start = start
    for i in range(n_arcs):
        f.add_arc(
            int(srcs[i]),
            pyfst.Arc(int(ils[i]), int(ols[i]), float(ws[i]), int(dsts[i])),
        )
    for i in range(n_fin):
        f.set_final(int(fs[i]), float(fw[i]))
    return f


def _run(op: int, f1: pyfst.Fst, f2: Optional[pyfst.Fst] = None) -> pyfst.Fst:
    lib = _get_lib()
    assert lib is not None
    b1 = pack_fst(f1)
    b2 = pack_fst(f2) if f2 is not None else b1
    out = ctypes.POINTER(ctypes.c_uint8)()
    out_len = ctypes.c_size_t()
    rc = lib.fstlib_run(op, b1, b2, ctypes.byref(out), ctypes.byref(out_len))
    if rc != 0:
        raise RuntimeError(f"fstlib op {op} failed rc={rc}")
    try:
        buf = ctypes.string_at(out, out_len.value)
    finally:
        lib.fstlib_free(out)
    return unpack_fst(buf)


# ---- dispatching API ----

def connect(f: pyfst.Fst) -> pyfst.Fst:
    return _run(1, f) if native_available() else pyfst.connect(f)


def compose(a: pyfst.Fst, b: pyfst.Fst) -> pyfst.Fst:
    return _run(2, a, b) if native_available() else pyfst.compose(a, b)


def rm_epsilon(f: pyfst.Fst, semiring: str = "tropical") -> pyfst.Fst:
    if native_available():
        return _run(3 if semiring == "tropical" else 4, f)
    return pyfst.rm_epsilon(f, semiring)


def determinize_star(f: pyfst.Fst, semiring: str = "tropical") -> pyfst.Fst:
    if native_available():
        return _run(5 if semiring == "tropical" else 6, f)
    return pyfst.determinize_star(f, semiring)


def minimize_encoded(f: pyfst.Fst) -> pyfst.Fst:
    return _run(7, f) if native_available() else pyfst.minimize_encoded(f)


def build_lg_fused(l: pyfst.Fst, g: pyfst.Fst) -> Optional[pyfst.Fst]:
    """arcsort_il(minimize(determinize_star_log(compose(L, G)))) in ONE
    native call (multi-million-arc intermediates never cross the Python
    boundary).  Returns None when the native library is unavailable."""
    if not native_available():
        return None
    try:
        return _run(8, l, g)
    except RuntimeError:
        return None  # older library without op 8 / det failure: caller
        #              falls back to the step-by-step path


def build_full_available() -> bool:
    lib = _get_lib()
    return lib is not None and hasattr(lib, "fstlib_build_full")


def build_full_compiled(
    t: pyfst.Fst, l: pyfst.Fst, g: pyfst.Fst,
    max_degree: int, hub_threshold: int, build_closure: bool,
):
    """The whole graph build — LG = min(det_log(L∘G)), then T∘LG
    compiled to device tables — in ONE native call.  Only T/L/G cross
    the Python boundary; the multi-million-arc LG/TLG intermediates
    stay in C++ (WSJ-tg scale: the LG Python round trip alone cost
    ~1.5 min on the split path)."""
    lib = _get_lib()
    assert lib is not None and hasattr(lib, "fstlib_build_full")
    lib.fstlib_build_full.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_size_t),
    ]
    lib.fstlib_build_full.restype = ctypes.c_int
    out = ctypes.POINTER(ctypes.c_uint8)()
    out_len = ctypes.c_size_t()
    rc = lib.fstlib_build_full(
        pack_fst(t), pack_fst(l), pack_fst(g),
        max_degree, hub_threshold, int(build_closure),
        ctypes.byref(out), ctypes.byref(out_len),
    )
    if rc != 0:
        raise RuntimeError(f"fstlib_build_full failed rc={rc}")
    try:
        buf = ctypes.string_at(out, out_len.value)
    finally:
        lib.fstlib_free(out)
    return _parse_compiled(buf)


def compile_graph_available() -> bool:
    lib = _get_lib()
    return lib is not None and hasattr(lib, "fstlib_compile_graph")


def build_tlg_compiled_available() -> bool:
    lib = _get_lib()
    return lib is not None and hasattr(lib, "fstlib_build_tlg_compiled")


def build_tlg_compiled(
    t: pyfst.Fst, lg: pyfst.Fst,
    max_degree: int, hub_threshold: int, build_closure: bool,
):
    """compose(T, LG) + degree-cap/CSR/closure compilation in one native
    call, returning a CompiledGraph without materializing the TLG as a
    Python Fst."""
    lib = _get_lib()
    assert lib is not None and hasattr(lib, "fstlib_build_tlg_compiled")
    lib.fstlib_build_tlg_compiled.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_size_t),
    ]
    lib.fstlib_build_tlg_compiled.restype = ctypes.c_int
    out = ctypes.POINTER(ctypes.c_uint8)()
    out_len = ctypes.c_size_t()
    rc = lib.fstlib_build_tlg_compiled(
        pack_fst(t), pack_fst(lg), max_degree, hub_threshold,
        int(build_closure), ctypes.byref(out), ctypes.byref(out_len),
    )
    if rc != 0:
        raise RuntimeError(f"fstlib_build_tlg_compiled failed rc={rc}")
    try:
        buf = ctypes.string_at(out, out_len.value)
    finally:
        lib.fstlib_free(out)
    return _parse_compiled(buf)


def compile_graph_native(
    f: pyfst.Fst, max_degree: int, hub_threshold: int, build_closure: bool,
):
    """Native degree-cap/CSR/closure graph compilation.  Returns a
    CompiledGraph identical to the pure-Python compile_graph (the two
    implementations are kept in algorithmic lockstep; cross-checked by
    tests/test_fst_native.py)."""
    from eesen_tpu.decoder.graph_compile import CompiledGraph

    lib = _get_lib()
    assert lib is not None and hasattr(lib, "fstlib_compile_graph")
    lib.fstlib_compile_graph.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_size_t),
    ]
    lib.fstlib_compile_graph.restype = ctypes.c_int
    out = ctypes.POINTER(ctypes.c_uint8)()
    out_len = ctypes.c_size_t()
    rc = lib.fstlib_compile_graph(
        pack_fst(f), max_degree, hub_threshold, int(build_closure),
        ctypes.byref(out), ctypes.byref(out_len),
    )
    if rc != 0:
        raise RuntimeError(f"fstlib_compile_graph failed rc={rc}")
    try:
        buf = ctypes.string_at(out, out_len.value)
    finally:
        lib.fstlib_free(out)
    return _parse_compiled(buf)


def _parse_compiled(buf: bytes):
    """Decode the fstlib compiled-graph buffer into a CompiledGraph."""
    from eesen_tpu.decoder.graph_compile import CompiledGraph

    hdr = np.frombuffer(buf, np.int64, 12)
    (n, start, ee, en, h, eh, has_clo, ec,
     max_e, max_n, depth, max_c) = (int(x) for x in hdr)
    off = 96

    def take(dtype, count):
        nonlocal off
        a = np.frombuffer(buf, dtype, count, off).copy()
        off += count * 4
        return a

    emit_offsets = take(np.int32, n + 1)
    emit_il = take(np.int32, ee)
    emit_ol = take(np.int32, ee)
    emit_w = take(np.float32, ee)
    emit_dst = take(np.int32, ee)
    eps_offsets = take(np.int32, n + 1)
    eps_ol = take(np.int32, en)
    eps_w = take(np.float32, en)
    eps_dst = take(np.int32, en)
    final = take(np.float32, n)
    hub_src = take(np.int32, h)
    hub_offsets = take(np.int32, h + 1)
    hub_packed = take(np.int32, eh * 4).reshape(-1, 4)
    g = CompiledGraph(
        num_states=n, start=start,
        emit_offsets=emit_offsets, emit_ilabel=emit_il, emit_olabel=emit_ol,
        emit_weight=emit_w, emit_dst=emit_dst,
        eps_offsets=eps_offsets, eps_olabel=eps_ol, eps_weight=eps_w,
        eps_dst=eps_dst, final_weight=final,
        max_emit_degree=max_e, max_eps_degree=max_n, eps_depth=depth,
        hub_src=hub_src, hub_offsets=hub_offsets, hub_packed=hub_packed,
    )
    if has_clo:
        g.closure_offsets = take(np.int32, n + 1)
        g.closure_packed = take(np.int32, ec * 4).reshape(-1, 4)
        g.max_closure_degree = max_c
    return g
