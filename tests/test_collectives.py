import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from x_as_supervision_tpu.parallel import collectives as C
from x_as_supervision_tpu.parallel import mesh as M


def test_shard_map_psum_and_pmean():
    mesh = M.make_mesh()
    n = mesh.shape[M.DATA_AXIS]
    x = jnp.arange(n * 4, dtype=jnp.float32).reshape(n * 4)

    def fn(v):
        return C.psum_data(v.sum()), C.pmean_data(v.sum())

    total, mean = C.data_parallel_shard_map(
        fn, mesh, in_specs=P(M.DATA_AXIS), out_specs=(P(), P())
    )(x)
    np.testing.assert_allclose(float(total), float(x.sum()))
    np.testing.assert_allclose(float(mean), float(x.sum()) / n)


def test_all_gather_and_ring_permute():
    mesh = M.make_mesh()
    n = mesh.shape[M.DATA_AXIS]
    x = jnp.arange(n, dtype=jnp.float32)

    def fn(v):
        gathered = C.all_gather_data(v)
        shifted = C.ppermute_ring(v)
        return gathered, shifted

    gathered, shifted = C.data_parallel_shard_map(
        fn, mesh, in_specs=P(M.DATA_AXIS),
        out_specs=(P(M.DATA_AXIS), P(M.DATA_AXIS)),
    )(x)
    # each shard gathered the full vector -> output tiled n times
    np.testing.assert_allclose(
        np.asarray(gathered), np.tile(np.asarray(x), n)
    )
    # ring shift by one: shard i's value lands on shard i+1
    np.testing.assert_allclose(
        np.asarray(shifted), np.roll(np.asarray(x), 1)
    )


def test_cross_host_mean_single_process_identity():
    tree = {"a": 1.0, "b": [2.0, 3.0]}
    assert C.cross_host_mean(tree) == tree


def test_hlo_collective_bytes_parses_shapes():
    hlo = "\n".join([
        "  %ar = f32[128,256] all-reduce(%p), replica_groups={}",
        "  %t = (f32[64], bf16[32,2]) all-reduce(%a, %b)",
        "  %ag = bf16[8,128]{1,0} all-gather-start(%x), dimensions={0}",
        "  %agd = bf16[8,128] all-gather-done(%ag)",  # not double-counted
        "  %cp = u8[16] collective-permute(%y)",
        "  %add = f32[128,256] add(%ar, %ar)",  # not a collective
    ])
    got = C.hlo_collective_bytes(hlo)
    assert got["all-reduce"] == 128 * 256 * 4 + 64 * 4 + 32 * 2 * 2
    assert got["all-gather"] == 8 * 128 * 2
    assert got["collective-permute"] == 16
    assert "add" not in got


def test_scaling_projection_micro_checks():
    """The explicit-SPMD helpers executed against live (8,1)/(4,2) meshes
    (the scaling probe is their production call site)."""
    from x_as_supervision_tpu.tools.scaling_projection import micro_checks

    assert micro_checks(8) == "ok"
