"""Console-variable (cvar) system.

TPU-native equivalent of the reference's CVar registry
(reference: source/utils/cvar.h — typed console variables with
ReadOnly/Scalability flags, change delegates and a name-hash map; every
renderer tunable in chord is a cvar, e.g. "r.gi.worldcache.probeDim").

Here cvars are the single flag mechanism for the engine: typed, flagged,
with change callbacks, settable from code / ini-style text / CLI.  Because
the frame is a jitted XLA program, cvars are *trace-time* constants: a cvar
change invalidates the cached jit by bumping a generation counter that the
renderer folds into its static config hash.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from enum import IntFlag
from typing import Any, Callable, Dict, List, Optional


class CVarFlags(IntFlag):
    NONE = 0
    READ_ONLY = 1      # cannot be set after registration
    SCALABILITY = 2    # participates in scalability presets
    ADVANCED = 4


@dataclass
class CVar:
    name: str
    value: Any
    default: Any
    help: str = ""
    flags: CVarFlags = CVarFlags.NONE
    vtype: type = float
    on_change: List[Callable[[Any], None]] = field(default_factory=list)

    def set(self, value: Any) -> None:
        if self.flags & CVarFlags.READ_ONLY:
            raise PermissionError(f"cvar '{self.name}' is read-only")
        value = self.vtype(value)
        if value != self.value:
            self.value = value
            for cb in self.on_change:
                cb(value)

    def reset(self) -> None:
        self.set(self.default)


class CVarSystem:
    """Global registry keyed by name (reference: utils/cvar.h CVarSystem)."""

    def __init__(self) -> None:
        self._vars: Dict[str, CVar] = {}
        self._lock = threading.Lock()
        self._generation = 0

    def register(
        self,
        name: str,
        default: Any,
        help: str = "",
        flags: CVarFlags = CVarFlags.NONE,
        vtype: Optional[type] = None,
    ) -> CVar:
        with self._lock:
            if name in self._vars:
                return self._vars[name]
            if vtype is None:
                vtype = bool if isinstance(default, bool) else type(default)
            var = CVar(name=name, value=default, default=default, help=help,
                       flags=flags, vtype=vtype)
            var.on_change.append(lambda _v: self._bump())
            self._vars[name] = var
            return var

    def _bump(self) -> None:
        self._generation += 1

    @property
    def generation(self) -> int:
        """Bumped on every cvar change; the renderer folds this into its
        static-config key so jit caches invalidate correctly."""
        return self._generation

    def get(self, name: str) -> Any:
        return self._vars[name].value

    def set(self, name: str, value: Any) -> None:
        self._vars[name].set(value)

    def exists(self, name: str) -> bool:
        return name in self._vars

    def all(self) -> Dict[str, CVar]:
        return dict(self._vars)

    def load_text(self, text: str) -> int:
        """Load `name = value` lines (ini-style, '#'/';' comments).

        The reference vendors inipp but never wires file IO into its cvar
        system (SURVEY §5); we close that gap.
        """
        count = 0
        for line in text.splitlines():
            line = line.split("#", 1)[0].split(";", 1)[0].strip()
            if not line or "=" not in line:
                continue
            name, _, raw = line.partition("=")
            name, raw = name.strip(), raw.strip()
            if not self.exists(name):
                continue
            var = self._vars[name]
            if var.vtype is bool:
                var.set(raw.lower() in ("1", "true", "on", "yes"))
            else:
                var.set(var.vtype(raw))
            count += 1
        return count


cvars = CVarSystem()

# ---------------------------------------------------------------------------
# Core renderer cvars — mirrors chord's label set where applicable.
# ---------------------------------------------------------------------------
cvars.register("r.raster.tileH", 216, "Raster tile height in pixels.",
               vtype=int)
cvars.register("r.raster.tileW", 128, "Raster tile width in pixels.", vtype=int)
cvars.register("r.raster.subS", 8,
               "Raster subwindows per 128-tri window (groups of 128/S "
               "tris, each with its own bbox row loop). Workload model: "
               "row iterations 59972/40555/32709 at S=4/8/16 on the "
               "bench heavy camera.", vtype=int)
cvars.register("r.raster.rp", 0,
               "Rows packed per raster inner iteration (0 = auto: subS). "
               "rp=8 with subS=16 works around the compile-helper ICE on "
               "full-width cs=8 packs.", vtype=int)
cvars.register("r.raster.subLoop", False,
               "Iterate raster subwindows with a dynamic fori_loop "
               "instead of unrolling S gated bodies (needed to compile "
               "subS=16: the unrolled Mosaic program crashes the remote "
               "compile helper).", vtype=bool)
cvars.register("r.raster.bricks", False,
               "Brick accumulator layout: vreg rows cover 4x32-px bricks "
               "so narrow triangle groups skip non-overlapped 32-px "
               "x-bricks (requires tileH % 16 == 0).")
cvars.register("r.raster.binCapacity", 1024,
               "Max binned triangles per tile (overflow counted, logged).", vtype=int)
cvars.register("r.raster.bigTriCapacity", 256,
               "Capacity of the large-triangle (tile-spanning) list.", vtype=int)
cvars.register("r.texture.compress", True,
               "Block-compress the paged virtual-texture pool (BC-style "
               "4x4 blocks, 4x smaller pages decoded at palette-stage "
               "time — ops/paged_texture.py compress_page; reference: "
               "asset_texture_helper.cpp BC1/BC3 CPU compressor). "
               "Default ON: measured free-or-faster on v5e (bench_ab "
               "tex 127.3 -> tex_comp 125.8 ms) at 4x less HBM.")
cvars.register("r.instanceculling.enable", True, "Object-level frustum culling.")
cvars.register("r.instanceculling.hzb", True, "Two-phase HZB occlusion culling.")
cvars.register("r.nanite.errorPixels", 1.0,
               "Cluster-LOD screen-space error threshold in pixels "
               "(reference: nanite_shared.hlsli DAG cut rule).")
cvars.register("r.shadow.cascadeCount", 4, "Number of shadow cascades.", vtype=int)
cvars.register("r.gi.enable", False, "Screen-probe GI.")
cvars.register("r.gi.worldcache.probeDim", 32,
               "World radiance cache probe volume dimension.", vtype=int)
cvars.register("r.gi.worldcache.cascades", 8,
               "World radiance cache clipmap cascade count.", vtype=int)
cvars.register("r.tsr.enable", False, "Temporal super resolution.")
cvars.register("r.tsr.sharpeness", 0.5, "TSR sharpen strength.")
cvars.register("r.bloom.enable", True, "Bloom pyramid.")
cvars.register("r.exposure.auto", True, "Histogram auto exposure.")
cvars.register("r.log.file", False, "Also log to disk.")
