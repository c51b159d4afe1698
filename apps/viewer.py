#!/usr/bin/env python
"""chord_tpu headless viewer — the `flower` application analog.

The reference ships an ImGui editor with live viewports (reference:
application/flower/ — widgets, viewport camera, DeferredRenderer per
viewport). On TPU presentation is headless (SURVEY §8.11: "present" =
device_get + image out): this app loads a scene (builtin procedural, a
.chtp scene asset, or a glTF/GLB file), flies a camera path, renders
through the full GPU-driven pipeline, and writes PNG frames (+ optional
GIF turntable).

Examples:
    python apps/viewer.py --scene sponza --frames 8 --out /tmp/out
    python apps/viewer.py --scene assets/city.glb --orbit --gif
    python apps/viewer.py --scene bistro --debug lod    # LOD visualize
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_scene(name: str):
    from chord_tpu.asset.procedural import (build_bistro_like,
                                            build_nanite_stress,
                                            build_sponza_like)
    from chord_tpu.asset.gltf import into_builder, load_gltf
    from chord_tpu.rhi.scene_arrays import SceneBuilder

    if name == "sponza":
        return build_sponza_like(detail=2), np.array([-15.0, 4.0, 3.0]), \
            np.array([10.0, 2.0, -2.0])
    if name == "bistro":
        return build_bistro_like(detail=2), np.array([-40.0, 5.0, 4.0]), \
            np.array([50.0, 3.0, -4.0])
    if name == "bistro_tex":   # textured variant (paged-sampler showcase)
        return build_bistro_like(detail=2, textures=True), \
            np.array([-40.0, 5.0, 4.0]), np.array([50.0, 3.0, -4.0])
    if name == "interior":    # BASELINE config #4: indoor diffuse GI
        from chord_tpu.asset.procedural import build_bistro_interior
        return build_bistro_interior(detail=2), \
            np.array([-6.0, 2.2, 3.6]), np.array([6.0, 1.2, -2.0])
    if name == "nanite":
        return build_nanite_stress(rings=64), \
            np.array([45.0, 10.0, 30.0]), np.array([0.0, 2.0, 0.0])
    p = Path(name)
    if p.suffix == ".chtp":
        # scene asset: load through SceneSubsystem with the builtin mesh
        # library registered (the flower analog: scene files reference
        # meshes/materials by key; builtin.* primitives are always there)
        from chord_tpu.scene import Scene, SceneSubsystem
        from chord_tpu.utils.camera import Camera as _Cam

        sub = SceneSubsystem()
        sub.register_builtin_meshes()
        sub.set_scene(Scene.load(p))
        col = sub.scene.tick(1 / 60)[0]
        sub.frame_state(col, _Cam())     # builds the instance builder
        b = sub._builder
        b.texture_pool = None
        los = [m.local_aabb()[0] for m in b.meshes]
        his = [m.local_aabb()[1] for m in b.meshes]
        lo = np.min(los, 0)
        hi = np.max(his, 0)
        c = (lo + hi) / 2
        r = float(np.linalg.norm(hi - lo)) * 0.9 + 1.0
        return b, c + np.array([r, r * 0.4, r]), c
    from chord_tpu.asset.texture import TexturePool

    tp = TexturePool(512)
    scene = load_gltf(p, texture_pool=tp)
    b = into_builder(scene, SceneBuilder())
    b.texture_pool = tp if tp.textures else None     # picked up in main()
    # frame the scene bounds
    los = [m.local_aabb()[0] for m in b.meshes]
    his = [m.local_aabb()[1] for m in b.meshes]
    lo = np.min(los, 0)
    hi = np.max(his, 0)
    c = (lo + hi) / 2
    r = float(np.linalg.norm(hi - lo)) * 0.9 + 1.0
    return b, c + np.array([r, r * 0.4, r]), c


def bounds_overlay(img_u8: "np.ndarray", builder, cam, view) -> "np.ndarray":
    """Wireframe instance bounding spheres over the frame (the reference's
    debug-line pass, renderer/debugline.cpp, fed host-side here)."""
    import jax.numpy as jnp

    from chord_tpu.ops.debug_draw import (overlay_lines, project_segments,
                                          sphere_segments)

    segs = []
    for mesh_id, _mat, l2w in builder.instances[:64]:
        mesh = builder.meshes[mesh_id]
        c = mesh.positions.mean(0)
        rad = float(np.linalg.norm(mesh.positions - c, axis=1).max())
        cw = np.append(c, 1.0).astype(np.float64) @ l2w
        scale = float(np.linalg.norm(l2w[:3, :3], axis=1).max())
        segs.append(sphere_segments(cw[:3] - cam.position,
                                    rad * scale, segs=16))
    if not segs:
        return img_u8
    vp = jnp.asarray(view.translated_world_to_clip_nojitter)
    px, ok = project_segments(jnp.asarray(np.concatenate(segs)), vp,
                              img_u8.shape[1], img_u8.shape[0])
    out = overlay_lines(jnp.asarray(img_u8, jnp.float32) / 255.0, px, ok,
                        color=(0.1, 1.0, 0.2), width_px=1.0)
    return np.asarray(jnp.clip(out * 255.0, 0, 255)).astype(np.uint8)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scene", default="sponza",
                    help="sponza | bistro | nanite | path/to/model.glb")
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=540)
    ap.add_argument("--frames", type=int, default=1)
    ap.add_argument("--orbit", action="store_true",
                    help="orbit the camera around the target")
    ap.add_argument("--out", default="/tmp/chord_view")
    ap.add_argument("--gif", action="store_true")
    ap.add_argument("--debug", default="none",
                    choices=["none", "meshlet", "lod", "normal", "depth",
                             "disocclusion", "motion", "gi", "specular"])
    ap.add_argument("--overlay", default="none",
                    choices=["none", "bounds"],
                    help="wireframe overlay: instance bounding spheres "
                         "(reference: debugline.cpp)")
    ap.add_argument("--no-nanite", action="store_true")
    ap.add_argument("--shadows", action="store_true")
    ap.add_argument("--atmosphere", action="store_true")
    ap.add_argument("--gi", action="store_true")
    ap.add_argument("--gi-mode", default="probe",
                    choices=["probe", "ddgi", "cache"],
                    help="probe = screen-probe stage (reference "
                         "screen_probe_gather pass list); cache = world "
                         "SH cache only")
    ap.add_argument("--gi-rt", action="store_true",
                    help="software-BVH ray fallback for probe rays + SSR "
                         "misses (offscreen geometry)")
    ap.add_argument("--rt-exact", action="store_true",
                    help="triangle-exact BVH leaves (the reference's real "
                         "ray query); default = fast meshlet proxies")
    ap.add_argument("--ssr", action="store_true")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--draw-capacity", type=int, default=8192,
                    help="visible-meshlet draw capacity (shrink for CPU "
                         "interpret-mode debugging)")
    ap.add_argument("--pair-capacity", type=int, default=16384,
                    help="raster work-queue (tile,window) pair capacity")
    ap.add_argument("--no-occlusion", action="store_true",
                    help="skip the two-phase HZB occlusion passes")
    ap.add_argument("--trace", default=None, metavar="DIR",
                    help="write a jax.profiler trace (the Tracy/GPU-"
                         "timestamp analog: every pass is a named_scope)")
    ap.add_argument("--stats", action="store_true",
                    help="print a per-pass device-ms table + draw stats "
                         "after rendering (the reference's System-widget "
                         "GPU timer readout, application/flower/widget/"
                         "viewport.cpp:159 + graphics/query.cpp). Implies "
                         "a profiler trace to a temp dir if --trace is "
                         "not given.")
    args = ap.parse_args()
    if args.stats and not args.trace:
        import tempfile
        args.trace = tempfile.mkdtemp(prefix="chord_viewer_trace_")

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from chord_tpu.native import available
    from chord_tpu.renderer.deferred import RendererConfig
    from chord_tpu.renderer.meshlet_frame import (MeshletFrameConfig,
                                                  MeshletRenderer)
    from chord_tpu.rhi.meshlet_scene import build_meshlet_pools
    from chord_tpu.utils.camera import Camera
    from chord_tpu.utils.log import get_logger
    from PIL import Image
    import jax

    log = get_logger("viewer")
    b, cam_pos, target = build_scene(args.scene)
    use_nanite = available() and not args.no_nanite
    tex_pool = getattr(b, "texture_pool", None)
    pools = build_meshlet_pools(b, nanite=use_nanite,
                                texture_pool=tex_pool)
    log.info("scene ready: %d meshlets, %d pairs, nanite=%s",
             pools.num_meshlets, pools.num_pairs, use_nanite)

    interpret = jax.default_backend() == "cpu"
    has_masked = any(m.alpha_mode == "mask" for m in b.materials)
    has_blend = any(m.alpha_mode == "blend" for m in b.materials)
    r = MeshletRenderer(
        RendererConfig(width=args.width, height=args.height,
                       pair_capacity=args.pair_capacity, big_capacity=128,
                       interpret=interpret),
        MeshletFrameConfig(draw_capacity=args.draw_capacity,
                           occlusion=not args.no_occlusion,
                           shadows=args.shadows, atmosphere=args.atmosphere,
                           gi=args.gi, debug_mode=args.debug,
                           # glTF with textures -> full textured shading
                           textured=tex_pool is not None,
                           normal_mapped=tex_pool is not None,
                           pbr_textures=tex_pool is not None,
                           gi_mode=args.gi_mode, gi_rt=args.gi_rt,
                           rt_granularity=("triangle" if args.rt_exact
                                           else "meshlet"),
                           ssr=args.ssr,
                           # masked/blend material buckets when present
                           alpha_masked=has_masked,
                           alpha_blend=has_blend,
                           blend_textured=any(
                               m.alpha_mode == "blend"
                               and m.base_color_texture >= 0
                               for m in b.materials)))

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    cam = Camera(width=args.width, height=args.height)
    images = []
    import contextlib
    trace_cm = (jax.profiler.trace(args.trace) if args.trace
                else contextlib.nullcontext())
    with trace_cm:
        _render_loop(args, b, cam, cam_pos, target, r, pools, images,
                     out_dir, log)
    if args.stats:
        _print_stats(args, log)
    if args.gif and len(images) > 1:
        _write_gif(images, out_dir, log)
    return 0


def _print_stats(args, log):
    """Per-pass device-ms table from the captured trace (the flower
    System widget's job: labeled per-pass GPU timings every frame)."""
    import os
    import sys as _sys
    _sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools"))
    try:
        from profile_trace import aggregate
        by_scope, _bl, _c, total = aggregate(args.trace)
    except Exception as e:  # noqa: BLE001 — stats are best-effort
        log.warning("stats: no usable trace (%s)", e)
        return
    div = max(args.frames, 1) * 1000.0
    print(f"== per-pass device ms/frame (total {total / div:.2f}) ==")
    for scope, us in by_scope.most_common(25):
        if scope in ("?", ""):
            continue
        print(f"{us / div:8.3f}  {scope}")


def _render_loop(args, b, cam, cam_pos, target, r, pools, images, out_dir,
                 log):
    import time

    import numpy as np
    from PIL import Image
    for i in range(args.frames):
        if args.orbit:
            ang = i / max(args.frames, 1) * 2 * np.pi
            rad = np.linalg.norm((cam_pos - target)[[0, 2]])
            cam.position = target + np.array(
                [rad * np.cos(ang), (cam_pos - target)[1],
                 rad * np.sin(ang)])
        else:
            cam.position = cam_pos + np.array([0.05 * i, 0.0, 0.0])
        cam.look_at(target)
        inst = b.frame_instances(cam)
        t0 = time.time()
        view_u = cam.view_uniform(i)
        img, stats = r.render(pools, inst, view_u)
        img = np.asarray(img)
        if args.overlay == "bounds":
            img = bounds_overlay(img, b, cam, view_u)
        log.info("frame %d: %.1f ms, drawn=%d overflow=%d", i,
                 (time.time() - t0) * 1000,
                 int(np.asarray(stats["drawn_tris"])),
                 int(np.asarray(stats["bin_overflow"])))
        Image.fromarray(img).save(out_dir / f"frame_{i:04d}.png")
        images.append(img)
    log.info("wrote %d frame(s) to %s", len(images), out_dir)


def _write_gif(images, out_dir, log):
    from PIL import Image
    frames = [Image.fromarray(i) for i in images]
    frames[0].save(out_dir / "turntable.gif", save_all=True,
                   append_images=frames[1:], duration=100, loop=0)
    log.info("wrote turntable.gif")


if __name__ == "__main__":
    raise SystemExit(main())
