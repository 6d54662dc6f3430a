"""Relative-position index tables vs an independent torch construction
following the reference recipe (models/MultiHeadAttention.py:55-90)."""

import numpy as np
import pytest
import torch

from lstc_vad_tpu.models import rpe


def torch_index_3d(wd, ws):
    coord_d = torch.arange(wd)
    coords_h = torch.arange(ws)
    coords_w = torch.arange(ws)
    coords = torch.stack(torch.meshgrid([coord_d, coords_h, coords_w],
                                        indexing="ij"))
    flat = torch.flatten(coords, 1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += wd - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 2] += ws - 1
    rel[:, :, 0] *= (2 * ws - 1) * (2 * ws - 1)
    rel[:, :, 1] *= 2 * ws - 1
    return rel.sum(-1).numpy()


def torch_index_2d(ws):
    coords_h = torch.arange(ws)
    coords_w = torch.arange(ws)
    coords = torch.stack(torch.meshgrid([coords_h, coords_w], indexing="ij"))
    flat = torch.flatten(coords, 1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1).numpy()


@pytest.mark.parametrize("wd,ws", [(3, 4), (5, 4), (2, 3), (7, 4), (1, 1)])
def test_index_3d_matches_reference_recipe(wd, ws):
    ours = rpe.relative_position_index_3d(wd, ws)
    np.testing.assert_array_equal(ours, torch_index_3d(wd, ws))
    n = wd * ws * ws
    assert ours.shape == (n, n)
    assert ours.min() >= 0
    assert ours.max() < rpe.table_size_3d(wd, ws)


@pytest.mark.parametrize("ws", [2, 3, 4, 5])
def test_index_2d_matches_reference_recipe(ws):
    ours = rpe.relative_position_index_2d(ws)
    np.testing.assert_array_equal(ours, torch_index_2d(ws))
    assert ours.max() < rpe.table_size_2d(ws)


def test_index_3d_symmetry_structure():
    # relative displacement (0,0,0) must sit on the diagonal
    idx = rpe.relative_position_index_3d(3, 4)
    diag = np.diag(idx)
    assert np.all(diag == diag[0])
