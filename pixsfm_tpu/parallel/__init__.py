from .sharded import (  # noqa: F401
    make_mesh, shard_ka_chunk, sharded_ba_solve, sharded_ka_solve,
    sharded_reference_extraction,
)
