from .mesh import make_mesh, channel_sharding, shard_demodulate, aggregate_metrics
from .halo import halo_exchange, demodulate_stream
from .channelize import channelize_stream
from .dispatch import ChannelDispatcher, GroupResult

__all__ = [
    "ChannelDispatcher",
    "GroupResult",
    "make_mesh",
    "channel_sharding",
    "shard_demodulate",
    "aggregate_metrics",
    "halo_exchange",
    "demodulate_stream",
    "channelize_stream",
]
