from .deferred import DeferredRenderer, RendererConfig, DeviceView  # noqa: F401
