from .scene_arrays import MeshData, MaterialData, ScenePools, SceneBuilder, FrameInstances
from .framebuffer import RenderTargets, FrameHistory
