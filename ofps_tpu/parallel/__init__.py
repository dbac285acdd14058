"""Multi-stream batching + mesh sharding (the scaling layer).

The reference's §2.9 parallelism inventory maps here: pipeline parallelism
stays host-side (decode thread -> device feed), estimator task-parallelism
fuses into one XLA program, and the *new* axis the reference lacks — data
parallelism over many video streams — is carried by ``StreamPipeline`` +
``jax.sharding`` over a ("stream", "space") mesh.
"""

from ofps_tpu.parallel.sharding import (
    StreamSharding,
    constrain,
    make_stream_mesh,
    shard_put,
    stream_sharding,
)
from ofps_tpu.parallel.stream import StreamOutputs, StreamPipeline, StreamState

__all__ = [
    "StreamSharding",
    "constrain",
    "make_stream_mesh",
    "shard_put",
    "stream_sharding",
    "StreamOutputs",
    "StreamPipeline",
    "StreamState",
]
