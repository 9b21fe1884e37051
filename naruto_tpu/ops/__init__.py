from naruto_tpu.ops.encoding import HashGridSpec, hash_encode, init_hash_table
from naruto_tpu.ops.one_blob import one_blob_encode
from naruto_tpu.ops.grid_sample import trilinear_sample
from naruto_tpu.ops.mlp import init_mlp_params, mlp_apply

__all__ = [
    "HashGridSpec", "hash_encode", "init_hash_table", "one_blob_encode",
    "trilinear_sample", "init_mlp_params", "mlp_apply",
]
