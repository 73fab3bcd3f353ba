"""Device-mesh construction and sharding helpers (data parallelism over ICI).

The reference's only parallelism is single-process ``torch.nn.DataParallel``
over <=4 GPUs (``imdb-wiki-dir/train.py:143``). Here data parallelism is a
first-class GSPMD design: one ``jax.sharding.Mesh`` with a ``data`` axis,
batch sharded over it, parameters/FDS state replicated; XLA inserts the
gradient and FDS-moment reductions over ICI."""

from imbalanced_regression_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    create_mesh,
    replicated,
    shard_batch,
)
