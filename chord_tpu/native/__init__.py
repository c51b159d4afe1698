"""ctypes bindings for the native (C++) asset pipeline.

The reference builds its offline geometry tooling in C++
(source/asset/nanite_builder.cpp + vendored meshoptimizer); ours lives in
native/nanite.cpp and is auto-built with make on first import. Falls back
cleanly (raises ImportError from `load()`) so pure-Python paths keep
working without a toolchain.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libchordnative.so"
_lib: Optional[ctypes.CDLL] = None


def load() -> ctypes.CDLL:
    """Load (building if needed) the native library."""
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.chord_nanite_build.restype = ctypes.c_int
    lib.chord_vertex_normals.restype = None
    lib.chord_bvh_build.restype = ctypes.c_int
    lib.chord_job_launch.restype = ctypes.c_int64
    lib.chord_job_launch_child.restype = ctypes.c_int64
    lib.chord_job_launch.argtypes = [
        _JOB_FN, ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int]
    lib.chord_job_launch_child.argtypes = [
        ctypes.c_int64, _JOB_FN, ctypes.c_void_p]
    lib.chord_job_wait.argtypes = [ctypes.c_int64]
    lib.chord_job_finished.argtypes = [ctypes.c_int64]
    lib.chord_job_finished.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    try:
        load()
        return True
    except Exception:
        return False


def _ptr(a: np.ndarray, ty):
    return a.ctypes.data_as(ctypes.POINTER(ty))


# ---------------------------------------------------------------------------
# Job system (native/jobsys.cpp): work-stealing worker pool with parent
# counters + dependency chains (reference: source/utils/job_system.h:239
# `launch`, :256 `parallelFor`; work_stealing_queue.h Chase-Lev deques).

_JOB_FN = ctypes.CFUNCTYPE(None, ctypes.c_void_p)
_FOR_FN = ctypes.CFUNCTYPE(None, ctypes.c_int, ctypes.c_void_p)
_RANGE_FN = ctypes.CFUNCTYPE(None, ctypes.c_long, ctypes.c_long,
                             ctypes.c_void_p)


class JobSystem:
    """Python face of the native job pool. Callbacks hop through ctypes
    (each acquires the GIL), so use this for orchestrating NATIVE work or
    coarse Python tasks; fine-grained Python loops belong in NumPy/JAX.

    Handles stay valid until drain(); exceptions raised inside callbacks
    are captured and re-raised by wait()/drain()."""

    def __init__(self):
        self._lib = load()
        self._keep: dict = {}     # job handle -> callback keep-alive
        self._errors: list = []

    @property
    def workers(self) -> int:
        return int(self._lib.chord_job_workers())

    def _wrap(self, fn):
        def call(_user):
            try:
                fn()
            except BaseException as e:   # noqa: BLE001 — crosses C ABI
                self._errors.append(e)
        return _JOB_FN(call)

    def launch(self, fn, deps: Tuple[int, ...] = ()) -> int:
        """Run fn() after every job in `deps` retires -> job handle."""
        cb = self._wrap(fn)
        n = len(deps)
        dep_arr = (ctypes.c_int64 * max(n, 1))(*deps) if n else None
        job = int(self._lib.chord_job_launch(cb, None, dep_arr, n))
        self._keep[job] = cb
        return job

    def launch_child(self, parent: int, fn) -> int:
        """Child job: waiting on `parent` also waits for the child
        (reference parent counters). Launch before waiting on parent."""
        cb = self._wrap(fn)
        job = int(self._lib.chord_job_launch_child(parent, cb, None))
        self._keep[job] = cb
        return job

    def wait(self, job: int) -> None:
        self._lib.chord_job_wait(job)
        self._raise()

    def finished(self, job: int) -> bool:
        return bool(self._lib.chord_job_finished(job))

    def drain(self) -> None:
        """Wait for ALL jobs; invalidates handles, frees the registry."""
        self._lib.chord_jobs_drain()
        self._keep.clear()
        self._raise()

    def parallel_for(self, n: int, fn) -> None:
        """fn(i) for i in [0, n) across the pool (blocking)."""
        def call(i, _user):
            try:
                fn(int(i))
            except BaseException as e:   # noqa: BLE001
                self._errors.append(e)
        cb = _FOR_FN(call)
        self._lib.chord_parallel_for(n, cb, None)
        self._raise()

    def parallel_for_grain(self, n: int, grain: int, fn) -> None:
        """fn(start, end) over [0, n) in chunks of `grain` (blocking) —
        the reference's parallelFor (job_system.h:256)."""
        def call(s, e, _user):
            try:
                fn(int(s), int(e))
            except BaseException as exc:   # noqa: BLE001
                self._errors.append(exc)
        cb = _RANGE_FN(call)
        self._lib.chord_parallel_for_grain(n, grain, cb, None)
        self._raise()

    def _raise(self):
        if self._errors:
            err = self._errors[0]
            self._errors.clear()
            raise err


_jobsys: "Optional[JobSystem]" = None


def job_system() -> JobSystem:
    """Process-global JobSystem (the reference's jobsystem:: singleton)."""
    global _jobsys
    if _jobsys is None:
        _jobsys = JobSystem()
    return _jobsys


def nanite_build(positions: np.ndarray, indices: np.ndarray,
                 build_lods: bool = True):
    """C++ cluster-LOD build -> dict of meshlet tables + index stream.

    Returns {indices (T',3), tri_offset, tri_count, lod_level, sphere,
    cone, lod_error, parent_error, lod_sphere, parent_sphere} — the DAG
    over ALL LOD levels in one flat meshlet list (runtime picks the cut,
    ops/cull.py lod_cut_visible).
    """
    lib = load()
    positions = np.ascontiguousarray(positions, np.float32)
    indices = np.ascontiguousarray(indices, np.int32).reshape(-1, 3)
    n_verts = len(positions)
    n_tris = len(indices)
    # LOD chain sums to < 2x the base triangles (each level halves)
    idx_cap = max(n_tris * 3, 1024)
    mcap = max(idx_cap // 32, 256)

    out_idx = np.zeros((idx_cap, 3), np.int32)
    tri_offset = np.zeros(mcap, np.int32)
    tri_count = np.zeros(mcap, np.int32)
    lod_level = np.zeros(mcap, np.int32)
    sphere = np.zeros((mcap, 4), np.float32)
    cone = np.zeros((mcap, 4), np.float32)
    lod_error = np.zeros(mcap, np.float32)
    parent_error = np.zeros(mcap, np.float32)
    lod_sphere = np.zeros((mcap, 4), np.float32)
    parent_sphere = np.zeros((mcap, 4), np.float32)
    n_meshlets = ctypes.c_int(0)
    n_tris_total = ctypes.c_int(0)

    rc = lib.chord_nanite_build(
        _ptr(positions, ctypes.c_float), n_verts,
        _ptr(indices, ctypes.c_int), n_tris,
        1 if build_lods else 0,
        _ptr(out_idx, ctypes.c_int), idx_cap,
        _ptr(tri_offset, ctypes.c_int), _ptr(tri_count, ctypes.c_int),
        _ptr(lod_level, ctypes.c_int),
        _ptr(sphere, ctypes.c_float), _ptr(cone, ctypes.c_float),
        _ptr(lod_error, ctypes.c_float), _ptr(parent_error, ctypes.c_float),
        _ptr(lod_sphere, ctypes.c_float), _ptr(parent_sphere, ctypes.c_float),
        mcap, ctypes.byref(n_meshlets), ctypes.byref(n_tris_total))
    if rc != 0:
        raise RuntimeError("chord_nanite_build: capacity exceeded")
    m = n_meshlets.value
    t = n_tris_total.value
    return {
        "indices": out_idx[:t].copy(),
        "tri_offset": tri_offset[:m].copy(),
        "tri_count": tri_count[:m].copy(),
        "lod_level": lod_level[:m].copy(),
        "sphere": sphere[:m].copy(),
        "cone": cone[:m].copy(),
        "lod_error": lod_error[:m].copy(),
        "parent_error": parent_error[:m].copy(),
        "lod_sphere": lod_sphere[:m].copy(),
        "parent_sphere": parent_sphere[:m].copy(),
    }


def bvh_build(spheres: np.ndarray):
    """C++ 8-wide BVH over leaf bounding spheres (reference:
    nanite_builder.cpp:77-313 buildBVHTree/flatten; GPUBVHNode
    shader/gltf.h:16-24). DFS pre-order flatten: `count` is a skip
    pointer (miss => i += count[i]) for the stackless TPU traversal
    (ops/rt.py).

    spheres: (N,4) f32 xyzr -> dict {sphere (M,4), children (M,8),
    count (M,), leaf (M,)}.
    """
    lib = load()
    spheres = np.ascontiguousarray(spheres, np.float32).reshape(-1, 4)
    n = len(spheres)
    cap = max(4 * n, 16)
    out_sphere = np.zeros((cap, 4), np.float32)
    out_children = np.zeros((cap, 8), np.int32)
    out_count = np.zeros(cap, np.int32)
    out_leaf = np.zeros(cap, np.int32)
    n_nodes = ctypes.c_int(0)
    rc = lib.chord_bvh_build(
        _ptr(spheres, ctypes.c_float), n,
        _ptr(out_sphere, ctypes.c_float), _ptr(out_children, ctypes.c_int),
        _ptr(out_count, ctypes.c_int), _ptr(out_leaf, ctypes.c_int),
        cap, ctypes.byref(n_nodes))
    if rc != 0:
        raise RuntimeError("chord_bvh_build: capacity exceeded")
    m = n_nodes.value
    return {"sphere": out_sphere[:m].copy(),
            "children": out_children[:m].copy(),
            "count": out_count[:m].copy(),
            "leaf": out_leaf[:m].copy()}


def vertex_normals(positions: np.ndarray, indices: np.ndarray) -> np.ndarray:
    lib = load()
    positions = np.ascontiguousarray(positions, np.float32)
    indices = np.ascontiguousarray(indices, np.int32)
    out = np.zeros_like(positions)
    lib.chord_vertex_normals(
        _ptr(positions, ctypes.c_float), len(positions),
        _ptr(indices, ctypes.c_int), len(indices.reshape(-1, 3)),
        _ptr(out, ctypes.c_float))
    return out


def nanite_build_batch(meshes, build_lods: bool = True):
    """Parallel C++ LOD builds (one pool task per mesh — the reference's
    jobsystem::parallelFor analog for asset import). `meshes` is a list of
    (positions, indices); returns a list of nanite_build-style dicts."""
    lib = load()
    n = len(meshes)
    if n == 0:
        return []
    pos_l, idx_l, bufs = [], [], []
    for positions, indices in meshes:
        pos_l.append(np.ascontiguousarray(positions, np.float32))
        idx_l.append(np.ascontiguousarray(indices, np.int32).reshape(-1, 3))

    def arr_ptrs(arrs, ty):
        return (ctypes.POINTER(ty) * n)(*[_ptr(a, ty) for a in arrs])

    n_verts = np.asarray([len(p) for p in pos_l], np.int32)
    n_tris = np.asarray([len(i) for i in idx_l], np.int32)
    idx_caps = np.asarray([max(t * 3, 1024) for t in n_tris], np.int32)
    mcaps = np.asarray([max(c // 32, 256) for c in idx_caps], np.int32)

    out = []
    for i in range(n):
        out.append({
            "indices": np.zeros((idx_caps[i], 3), np.int32),
            "tri_offset": np.zeros(mcaps[i], np.int32),
            "tri_count": np.zeros(mcaps[i], np.int32),
            "lod_level": np.zeros(mcaps[i], np.int32),
            "sphere": np.zeros((mcaps[i], 4), np.float32),
            "cone": np.zeros((mcaps[i], 4), np.float32),
            "lod_error": np.zeros(mcaps[i], np.float32),
            "parent_error": np.zeros(mcaps[i], np.float32),
            "lod_sphere": np.zeros((mcaps[i], 4), np.float32),
            "parent_sphere": np.zeros((mcaps[i], 4), np.float32),
        })
    n_meshlets = np.zeros(n, np.int32)
    n_tris_total = np.zeros(n, np.int32)

    c_int_p = ctypes.POINTER(ctypes.c_int)
    c_f_p = ctypes.POINTER(ctypes.c_float)
    rc = lib.chord_nanite_build_batch(
        n, arr_ptrs(pos_l, ctypes.c_float), _ptr(n_verts, ctypes.c_int),
        arr_ptrs(idx_l, ctypes.c_int), _ptr(n_tris, ctypes.c_int),
        1 if build_lods else 0,
        arr_ptrs([o["indices"] for o in out], ctypes.c_int),
        _ptr(idx_caps, ctypes.c_int),
        arr_ptrs([o["tri_offset"] for o in out], ctypes.c_int),
        arr_ptrs([o["tri_count"] for o in out], ctypes.c_int),
        arr_ptrs([o["lod_level"] for o in out], ctypes.c_int),
        arr_ptrs([o["sphere"] for o in out], ctypes.c_float),
        arr_ptrs([o["cone"] for o in out], ctypes.c_float),
        arr_ptrs([o["lod_error"] for o in out], ctypes.c_float),
        arr_ptrs([o["parent_error"] for o in out], ctypes.c_float),
        arr_ptrs([o["lod_sphere"] for o in out], ctypes.c_float),
        arr_ptrs([o["parent_sphere"] for o in out], ctypes.c_float),
        _ptr(mcaps, ctypes.c_int),
        _ptr(n_meshlets, ctypes.c_int), _ptr(n_tris_total, ctypes.c_int))
    if rc != 0:
        raise RuntimeError("chord_nanite_build_batch: capacity exceeded")
    res = []
    for i, o in enumerate(out):
        m, t = int(n_meshlets[i]), int(n_tris_total[i])
        res.append({k: (v[:t] if k == "indices" else v[:m]).copy()
                    for k, v in o.items()})
    return res
