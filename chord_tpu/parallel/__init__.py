from .sharded import ShardedRenderer, strip_device_views, dryrun  # noqa: F401
