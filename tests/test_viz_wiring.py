"""Viewer wiring tests with a mocked pybullet module (the wheel is not a
framework dependency), plus the URDF exporter round-trip.

Covers the reference's render path surface: two characters + SBP markers +
heightfield re-mesh (render_funcs.py:69-227) driven by replay_compare, and
the generated URDF asset matching the skeleton tables exactly.
"""

import sys
import types

import numpy as np
import pytest


class _FakePB(types.ModuleType):
    """Minimal pybullet stand-in recording every call."""

    GUI, DIRECT = 1, 2
    GEOM_SPHERE, GEOM_HEIGHTFIELD = 2, 9
    URDF_MAINTAIN_LINK_ORDER = 131072

    def __init__(self):
        super().__init__("pybullet")
        self.calls = []
        self._bodies = 0
        self._shapes = 0

    def connect(self, mode):
        self.calls.append(("connect", mode))
        return 0

    def disconnect(self, client):
        self.calls.append(("disconnect", client))

    def loadURDF(self, path, pos, useFixedBase=False, flags=0):
        self.calls.append(("loadURDF", path))
        self._bodies += 1
        return self._bodies

    def getNumJoints(self, body):
        return 19

    def changeVisualShape(self, body, link, rgbaColor=None):
        self.calls.append(("color", body, link))

    def createVisualShape(self, kind, radius=None, rgbaColor=None):
        self._shapes += 1
        return self._shapes

    def createCollisionShape(self, shapeType=None, meshScale=None,
                             heightfieldData=None, numHeightfieldRows=0,
                             numHeightfieldColumns=0,
                             replaceHeightfieldIndex=None):
        self.calls.append(("heightfield", numHeightfieldRows,
                           numHeightfieldColumns,
                           replaceHeightfieldIndex))
        self._shapes += 1
        return self._shapes

    def createMultiBody(self, mass=0, baseVisualShapeIndex=None):
        self._bodies += 1
        return self._bodies

    def resetBasePositionAndOrientation(self, body, pos, quat):
        self.calls.append(("base", body, tuple(np.asarray(pos))))

    def resetJointStatesMultiDof(self, body, joints, quats, vels):
        self.calls.append(("joints", body, len(joints), len(quats)))


@pytest.fixture()
def fake_pb(monkeypatch):
    pb = _FakePB()
    monkeypatch.setitem(sys.modules, "pybullet", pb)
    return pb


def test_viewer_and_replay_compare(fake_pb, tmp_path):
    from tip_tpu.viz import pybullet_viz, urdf_export

    urdf = str(tmp_path / "amass.urdf")
    urdf_export.skeleton_to_urdf(urdf)
    v = pybullet_viz.Viewer(urdf, gui=False, n_markers=10, compare_gt=True)
    assert sum(1 for c in fake_pb.calls if c[0] == "loadURDF") == 2

    T, rng = 31, np.random.default_rng(0)
    pred = rng.normal(size=(T, 57)) * 0.1
    gt = rng.normal(size=(T, 57)) * 0.1
    locs = rng.normal(size=(T, 5, 3))
    heights = np.zeros((16, 16))
    pybullet_viz.replay_compare(v, pred, gt, viz_locs=locs, heights=heights,
                                grid_size=0.1, fps=None)

    joints = [c for c in fake_pb.calls if c[0] == "joints"]
    assert len(joints) == 2 * T                 # ours + GT every frame
    assert all(c[2] == 17 for c in joints)      # 17 spherical joints set
    hf = [c for c in fake_pb.calls if c[0] == "heightfield"]
    assert len(hf) == int(np.ceil(T / 15))      # re-mesh every 15 frames
    assert hf[0][3] is None and hf[1][3] is not None   # replace after create
    v.close()


def test_urdf_export_roundtrip(tmp_path):
    """parse_urdf(skeleton_to_urdf(...)) == the source tables exactly."""
    from tip_tpu.chars import amass as amass_char
    from tip_tpu.chars import amass_skeleton as tbl
    from tip_tpu.utils.urdf import parse_urdf
    from tip_tpu.viz import urdf_export

    path = str(tmp_path / "gen.urdf")
    urdf_export.skeleton_to_urdf(path)
    sk = parse_urdf(path, prefer_native=False)

    assert sk.joint_names == list(amass_char.JOINT_NAMES)
    np.testing.assert_array_equal(sk.parent, tbl.PARENT)
    np.testing.assert_allclose(sk.joint_offset, tbl.JOINT_OFFSET, atol=1e-7)
    np.testing.assert_array_equal(sk.is_fixed, tbl.IS_FIXED)
    np.testing.assert_allclose(sk.com_offset, tbl.COM_OFFSET, atol=1e-7)
    np.testing.assert_allclose(sk.link_mass, tbl.LINK_MASS, atol=1e-7)


def test_urdf_export_native_parser_roundtrip(tmp_path):
    """The C++ parser reads the generated asset identically (skipped when
    the native lib is not built)."""
    import os

    from tip_tpu.chars import amass_skeleton as tbl
    from tip_tpu.utils import urdf as urdf_lib
    from tip_tpu.viz import urdf_export

    if not os.path.exists(urdf_lib._NATIVE_LIB):
        pytest.skip("native lib not built")
    path = str(tmp_path / "gen.urdf")
    urdf_export.skeleton_to_urdf(path)
    sk = urdf_lib._parse_native(path)
    assert sk is not None
    np.testing.assert_array_equal(sk.parent, tbl.PARENT)
    np.testing.assert_allclose(sk.joint_offset, tbl.JOINT_OFFSET, atol=1e-7)
    np.testing.assert_allclose(sk.com_offset, tbl.COM_OFFSET, atol=1e-7)
