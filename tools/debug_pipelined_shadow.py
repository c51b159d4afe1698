"""Debug the pipelined-shadow path: per-frame divergence between
ShadowConfig.pipelined=True and =False on a static scene (expected: the
one-update lag decays; any persistent error is a phase/consumption bug)."""
import sys

sys.path.insert(0, ".")

import numpy as np

from chord_tpu.asset.procedural import build_sponza_like
from chord_tpu.renderer.deferred import RendererConfig
from chord_tpu.renderer.meshlet_frame import (MeshletFrameConfig,
                                              MeshletRenderer)
from chord_tpu.ops.shadow import ShadowConfig
from chord_tpu.rhi.meshlet_scene import build_meshlet_pools
from chord_tpu.utils.camera import Camera


def make(pipelined):
    scfg = ShadowConfig(cascade_count=2, resolution=256,
                        pcss_blocker_samples=4, pcss_pcf_samples=4,
                        temporal=True, jitter=False, temporal_alpha=0.4,
                        pipelined=pipelined)
    return MeshletRenderer(
        RendererConfig(width=96, height=48, pair_capacity=4096,
                       big_capacity=128, interpret=True,
                       enable_bloom=False, enable_tsr=False),
        MeshletFrameConfig(draw_capacity=1024, shadows=True,
                           shadow_cfg=scfg, shadow_draw_capacity=1024))


def main():
    b = build_sponza_like(detail=1)
    pools = build_meshlet_pools(b)
    cam = Camera(width=96, height=48)
    cam.position = np.array([-15.0, 4.0, 0.0])
    cam.look_at(np.array([10.0, 2.0, 0.0]))
    inst = b.frame_instances(cam)

    r_dir, r_pipe = make(False), make(True)
    for i in range(12):
        r_dir.render(pools, inst, cam.view_uniform(i))
        r_pipe.render(pools, inst, cam.view_uniform(i))
        m_d = np.asarray(r_dir.history.shadow_mask)
        m_p = np.asarray(r_pipe.history.shadow_mask)
        q_d = None
        q_p = np.asarray(r_pipe.history.shadow_mask)
        print(f"frame {i}: mask|d|={np.abs(m_p - m_d).mean():.4f} "
              f"mask_dir[mean={m_d.mean():.3f}] mask_pipe[mean={m_p.mean():.3f}] "
              f"q_pipe[mean={q_p.mean():.3f} min={q_p.min():.3f}]",
              flush=True)


if __name__ == "__main__":
    main()
