"""Warp-field RAI permutation/sign postprocess golden tests.

The reference converts the predicted field into SCT's RAI component
convention via ``aff2axcodes(-fixed_affine)`` lookups
(`bids_registration.py:403-421`). Axis mistakes here are silent, so we pin
hand-derived expectations for known orientations.
"""

import numpy as np

from multimodal_registration_tpu.infer.register import postprocess_and_save
from multimodal_registration_tpu.utils import nifti


def _run(affine, warp_vec, tmp_path):
    shape = (8, 8, 8)
    warp = np.zeros((*shape, 3), np.float32)
    warp[...] = warp_vec
    fixed_proc = nifti.NiftiImage(np.zeros(shape, np.float32), affine)
    fixed_nii = nifti.NiftiImage(np.zeros(shape, np.float32), affine)
    moving_nii = nifti.NiftiImage(np.zeros(shape, np.float32), affine)
    moved = np.zeros(shape, np.float32)
    paths = {"warp_proc": str(tmp_path / "warp.nii.gz")}
    _, warp_exp = postprocess_and_save(
        warp, 1, fixed_proc, fixed_nii, moving_nii, moved, paths
    )
    saved = nifti.load(paths["warp_proc"])
    assert saved.header["intent_code"] == 1007
    return warp_exp[0, 0, 0, 0]  # the constant vector after permutation


def test_ras_fixed_image(tmp_path):
    # RAS affine: aff2axcodes(-I) = (L, P, I) → R,A flipped; I kept
    out = _run(np.eye(4), (1.0, 2.0, 3.0), tmp_path)
    np.testing.assert_allclose(out, [-1.0, -2.0, 3.0])


def test_swapped_xy_fixed_image(tmp_path):
    # vox0→+A, vox1→+R, vox2→+S world axes:
    # aff2axcodes(-aff) = (P, L, I) → saved = (-w1, -w0, +w2)
    aff = np.zeros((4, 4))
    aff[1, 0] = 1.0  # vox axis 0 → world y (A)
    aff[0, 1] = 1.0  # vox axis 1 → world x (R)
    aff[2, 2] = 1.0
    aff[3, 3] = 1.0
    out = _run(aff, (1.0, 2.0, 3.0), tmp_path)
    np.testing.assert_allclose(out, [-2.0, -1.0, 3.0])


def test_lpi_fixed_image(tmp_path):
    # LPI affine (diag -1,-1,-1): aff2axcodes(+I... of -aff) = (R, A, S)
    # 'R' at 0 (+1), 'A' at 1 (+1), 'I' → opposite 'S' at 2 (-1)
    aff = np.diag([-1.0, -1.0, -1.0, 1.0])
    out = _run(aff, (1.0, 2.0, 3.0), tmp_path)
    np.testing.assert_allclose(out, [1.0, 2.0, -3.0])


def _expected_rai_vector(affine, warp_vec):
    """Independent first-principles expectation for the RAI export.

    Works directly on NEGATED voxel-axis direction vectors (the reference
    keys its lookup on ``aff2axcodes(-affine)``, `bids_registration.py:404`):
    exported component i (targets R, A, I) takes the warp component of the
    voxel axis whose negated direction is dominant along that anatomical
    world axis, positive if it points WITH the target letter's direction.
    No aff2axcodes / opposite-table code is reused.
    """
    # anatomical target directions in world (x=R+, y=A+, z=S+): R, A, I
    targets = np.array([[1, 0, 0], [0, 1, 0], [0, 0, -1]], np.float64)
    d = -np.asarray(affine, np.float64)[:3, :3]  # negated voxel axis dirs (cols)
    # each voxel axis j points dominantly along one world axis (column-major,
    # like orientation codes are assigned)
    world_of = [int(np.argmax(np.abs(d[:, j]))) for j in range(3)]
    assert sorted(world_of) == [0, 1, 2], "test affine lost axis dominance"
    out = np.zeros(3)
    for i in range(3):
        w = int(np.argmax(np.abs(targets[i])))  # world axis of this letter
        j = world_of.index(w)                   # voxel axis living on it
        s = 1.0 if d[:, j] @ targets[i] > 0 else -1.0
        out[i] = s * warp_vec[j]
    return out


def test_rai_export_orientation_sweep(tmp_path):
    """VERDICT r2 item 8: fuzz the RAI postprocess contract over every
    axis permutation x sign combination (48 orientations), with random
    anisotropic zooms, origins, and warp vectors — plus mildly oblique
    versions of each — against the independent expectation above."""
    import itertools

    rng = np.random.default_rng(0)
    n_checked = 0
    for perm in itertools.permutations(range(3)):
        for signs in itertools.product((1.0, -1.0), repeat=3):
            zooms = rng.uniform(0.5, 3.0, size=3)
            aff = np.zeros((4, 4))
            for j in range(3):
                aff[perm[j], j] = signs[j] * zooms[j]
            aff[:3, 3] = rng.uniform(-50, 50, size=3)
            aff[3, 3] = 1.0
            for oblique in (False, True):
                a = aff.copy()
                if oblique:
                    # small rotation (< ~15 deg) keeps axis dominance intact
                    th = rng.uniform(-0.25, 0.25)
                    rot = np.eye(4)
                    rot[:2, :2] = [[np.cos(th), -np.sin(th)],
                                   [np.sin(th), np.cos(th)]]
                    a = rot @ a
                vec = tuple(rng.uniform(-5, 5, size=3))
                out = _run(a, vec, tmp_path)
                np.testing.assert_allclose(
                    out, _expected_rai_vector(a, vec), atol=1e-5,
                    err_msg=f"perm={perm} signs={signs} oblique={oblique}",
                )
                n_checked += 1
    assert n_checked == 96


def test_affine_roundtrip_orientation_sweep(tmp_path):
    """Save/load round-trip of utils/nifti.py across >= 100 random
    orientations: the decoded affine and data must reproduce the originals
    (exercises both the sform path and the quaternion/qform encoding)."""
    rng = np.random.default_rng(1)
    perms = [(0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1), (2, 1, 0)]
    n = 0
    for trial in range(108):
        perm = perms[trial % 6]
        signs = [(-1.0) ** ((trial >> k) & 1) for k in range(3)]
        zooms = rng.uniform(0.3, 4.0, size=3)
        aff = np.zeros((4, 4))
        for j in range(3):
            aff[perm[j], j] = signs[j] * zooms[j]
        aff[:3, 3] = rng.uniform(-100, 100, size=3)
        aff[3, 3] = 1.0
        if trial % 3 == 0:  # oblique rotation every third trial
            th = rng.uniform(-np.pi, np.pi)
            rot = np.eye(4)
            axes = [(0, 1), (0, 2), (1, 2)][trial % 3]
            rot[np.ix_(axes, axes)] = [[np.cos(th), -np.sin(th)],
                                       [np.sin(th), np.cos(th)]]
            aff = rot @ aff
        data = rng.normal(size=(5, 6, 7)).astype(np.float32)
        p = str(tmp_path / f"rt_{trial}.nii.gz")
        nifti.save(nifti.NiftiImage(data, aff), p)
        back = nifti.load(p)
        np.testing.assert_allclose(np.asarray(back.affine), aff,
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"trial {trial}")
        np.testing.assert_array_equal(back.get_fdata().astype(np.float32), data)
        n += 1
    assert n >= 100
