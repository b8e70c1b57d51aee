from vitta_tpu.parallel.mesh import make_mesh, shard_leading_axis  # noqa: F401
from vitta_tpu.parallel.streams import StreamParallelEngine  # noqa: F401
