from egonet_tpu.serving.server import MicroBatcher, PoseServer

__all__ = ["MicroBatcher", "PoseServer"]
