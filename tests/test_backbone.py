import numpy as np
import jax
import jax.numpy as jnp
import pytest

from detection_3d_tpu.config import Config, Sparse3DConfig, CapacityConfig
from detection_3d_tpu.config.defaults import RPNConfig, ROIConfig
from detection_3d_tpu.models.backbone import SparseFPN, build_pyramid
from detection_3d_tpu.ops.sparse import build_sparse_tensor


@pytest.fixture(scope="module")
def tiny_cfg():
    # 4-scale miniature FPN on a 64^3 grid
    return Config(
        sparse3d=Sparse3DConfig(
            voxel_full_scale=(64, 64, 16),
            nplanes_front=(8, 16, 16, 32),
            kernels=((2, 2, 2),) * 3,
            strides=((2, 2, 2),) * 3,
            nplane_map=16,
        ),
        rpn=RPNConfig(rpn_scales_from_top=(2, 1),
                      rpn_3d_2d_selector=(0, 2, 3),
                      anchor_sizes_3d=((0.2, 0.5, 3), (0.4, 1.5, 3),
                                       (0.6, 2.5, 3)),
                      use_yaws=(1, 1, 1)),
        roi=ROIConfig(pooler_scales_from_top=(2, 1)),
        caps=CapacityConfig(max_points=2048,
                            voxel_caps=(512, 256, 128, 64)),
    )


@pytest.fixture(scope="module")
def tiny_input(tiny_cfg):
    rng = np.random.RandomState(0)
    n = 300
    coords = np.c_[rng.randint(0, 64, (n, 2)), rng.randint(0, 16, (n, 1)),
                   np.zeros((n, 1))].astype(np.int32)
    feats = rng.randn(n, 9).astype(np.float32)
    return build_sparse_tensor(jnp.array(coords), jnp.array(feats),
                               jnp.ones(n, bool), (64, 64, 16), 1, 512)


def test_pyramid_shapes(tiny_cfg, tiny_input):
    pyr = build_pyramid(tiny_input, tiny_cfg)
    assert len(pyr["tables"]) == 4
    assert len(pyr["down_rb"]) == 3
    assert len(pyr["up_rb"]) == 3
    # scales shrink monotonically
    nums = [int(t.num) for t in pyr["tables"]]
    assert all(a >= b for a, b in zip(nums, nums[1:]))
    assert nums[-1] > 0
    # bev tables exist for both rpn scales
    assert set(pyr["bev"].keys()) == {0, 1}


def test_backbone_forward(tiny_cfg, tiny_input):
    pyr = build_pyramid(tiny_input, tiny_cfg)
    model = SparseFPN(tiny_cfg)
    params = model.init(jax.random.PRNGKey(0), tiny_input, pyr)
    rpn_maps, roi_maps = model.apply(params, tiny_input, pyr)
    # selector (0, 2, 3) over [3d_0, 3d_1, 2d_0, 2d_1]
    assert len(rpn_maps) == 3
    assert len(roi_maps) == 2
    for m in rpn_maps + roi_maps:
        assert m.feats.shape[-1] == 16
        f = np.asarray(m.feats)
        assert np.all(np.isfinite(f))
        # valid rows have nonzero activations somewhere, invalid rows zero
        assert np.all(f[int(m.num):] == 0)
    # 2d maps live on z-collapsed grids
    assert rpn_maps[1].spatial_size[2] == 1
    assert rpn_maps[2].spatial_size[2] == 1
    # 3d map 0 = ups[2] = scale 1 (4-1-2... from_top=2 -> scale 1)
    assert rpn_maps[0].spatial_size == (32, 32, 8)


def test_backbone_grad_flows(tiny_cfg, tiny_input):
    pyr = build_pyramid(tiny_input, tiny_cfg)
    model = SparseFPN(tiny_cfg)
    params = model.init(jax.random.PRNGKey(0), tiny_input, pyr)

    def loss_fn(p):
        rpn_maps, _ = model.apply(p, tiny_input, pyr)
        return sum(jnp.sum(m.feats ** 2) for m in rpn_maps)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # gradient reaches the input conv
    gin = np.asarray(g["params"]["conv_in"]["w"])
    assert np.abs(gin).max() > 0
