"""The dcn_data fold fallback must VERIFY or REFUSE, never guess
(core.mesh._check_slice_major — VERDICT r2 weak #7): a wrong slice-major
assumption on real multi-slice hardware silently routes per-shard ICI
traffic over DCN."""
import types

import pytest

from recommender_tpu.core.mesh import MeshSpec, _check_slice_major, make_mesh


def _dev(platform="tpu", slice_index=None):
    d = types.SimpleNamespace(platform=platform)
    if slice_index is not None:
        d.slice_index = slice_index
    return d


ERR = RuntimeError("no hybrid mesh")


def test_verified_slice_major_passes_silently():
    devs = [_dev(slice_index=s) for s in (0, 0, 0, 0, 1, 1, 1, 1)]
    # 2 slices x (data=2, model=2): blocks of 4 each on one slice
    _check_slice_major(devs, MeshSpec(data=2, model=2, dcn_data=2), ERR)


def test_wrong_order_raises():
    devs = [_dev(slice_index=s) for s in (0, 1, 0, 1, 0, 1, 0, 1)]
    with pytest.raises(ValueError, match="NOT slice-major"):
        _check_slice_major(devs, MeshSpec(data=2, model=2, dcn_data=2), ERR)


def test_wrong_slice_count_raises():
    # order is blockwise-uniform but only one distinct slice for dcn_data=2
    devs = [_dev(slice_index=0) for _ in range(8)]
    with pytest.raises(ValueError, match="NOT slice-major"):
        _check_slice_major(devs, MeshSpec(data=2, model=2, dcn_data=2), ERR)


def test_cpu_test_mesh_warns_and_assumes():
    devs = [_dev(platform="cpu") for _ in range(8)]
    with pytest.warns(UserWarning, match="slice-major"):
        _check_slice_major(devs, MeshSpec(data=2, model=2, dcn_data=2), ERR)


def test_no_topology_on_accelerators_refuses():
    devs = [_dev(platform="tpu") for _ in range(8)]
    with pytest.raises(ValueError, match="Refusing to guess"):
        _check_slice_major(devs, MeshSpec(data=2, model=2, dcn_data=2), ERR)


def test_real_cpu_fold_still_builds(devices8):
    # end-to-end: the 8-virtual-CPU-device fold builds a working mesh
    with pytest.warns(UserWarning):
        mesh = make_mesh(MeshSpec(data=2, model=2, dcn_data=2))
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "data": 4, "model": 2}
