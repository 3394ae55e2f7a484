"""Canonical 3D cuboid construction, edge interpolation, camera-frame
placement and projection.

Behavioural spec (cited for parity checking):
  * 9-point canonical box     -> /root/reference/libs/dataset/KITTI/car_instance.py:730-747
  * edge interpolation        -> car_instance.py:705-728
  * camera-frame placement    -> car_instance.py:749-790
  * pinhole projection        -> car_instance.py:557-563
  * visibility predicate      -> car_instance.py:855-868

All functions are NumPy (host-side dataset preparation); the batched JNP
twins used inside the jitted pipeline live in egonet_tpu/geometry/rigid.py.
"""

from __future__ import annotations

import numpy as np

from egonet_tpu.constants import INTERP_DICT, DEFAULT_INTERP_COEF


def interpolate_cuboid(bbox_3d: np.ndarray,
                       style: str = "bbox12",
                       interp_coef=DEFAULT_INTERP_COEF,
                       dimension=None) -> np.ndarray:
    """Append interpolated points along cuboid edges.

    bbox_3d: [3, K] points whose columns 1..8 are the 8 corners (column 0 is
    the center).  For each edge (parent, child) and each coefficient c a new
    point parent + c*(child-parent) is appended, giving [3, K + E*len(coef)].
    """
    if dimension is not None:
        # size-encoded edge subset selection (vestigial reference feature)
        l = dimension[0]
        style += "l" if l < 3.5 else ("h" if l < 4.5 else "w")
    pidx, cidx = INTERP_DICT[style]
    parents, children = bbox_3d[:, pidx], bbox_3d[:, cidx]
    lines = children - parents
    new_joints = [parents + c * lines for c in interp_coef]
    return np.hstack([bbox_3d] + new_joints)


def construct_box_3d(l: float, h: float, w: float,
                     interpolate: bool = True,
                     style: str = "bbox12",
                     interp_coef=DEFAULT_INTERP_COEF) -> np.ndarray:
    """Canonical cuboid: center + 8 corners (+ optional interpolated points).

    The canonical pose puts the box bottom-center at the origin with y up
    being negative (KITTI camera convention: y points down, the location is
    the bottom-face center).  Returns [3, 9] or [3, 9 + 12*len(coef)].
    """
    # the reference shifts at float32 precision (halved l/w, FULL h —
    # car_instance.py:737-739); replicate all three for bit-level parity
    x_c = (np.array([0.5 * l, l, l, l, l, 0, 0, 0, 0], dtype=np.float64)
           - np.float32(l) / 2)
    y_c = (np.array([0.5 * h, 0, h, 0, h, 0, h, 0, h], dtype=np.float64)
           - np.float32(h))
    z_c = (np.array([0.5 * w, w, w, 0, 0, w, w, 0, 0], dtype=np.float64)
           - np.float32(w) / 2)
    corners = np.array([x_c, y_c, z_c])
    if interpolate:
        corners = interpolate_cuboid(corners, style, interp_coef)
    return corners


def rot_y_matrix(ry: float) -> np.ndarray:
    c, s = np.cos(ry), np.sin(ry)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def rotation_matrix_xyz(rx: float, ry: float, rz: float) -> np.ndarray:
    """Rz @ Ry @ Rx composition (used by pose-vector augmentation)."""
    cx, sx = np.cos(rx), np.sin(rx)
    cz, sz = np.cos(rz), np.sin(rz)
    mx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    mz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return mz @ rot_y_matrix(ry) @ mx


def place_cuboid(corners_canonical: np.ndarray,
                 pose_vec: np.ndarray,
                 shift: np.ndarray,
                 rot_xz: bool = False) -> np.ndarray:
    """Rotate + translate the canonical cuboid into the camera frame.

    pose_vec: [6] = (x, y, z, rx, ry, rz); KITTI labels only carry ry.
    shift: [3, 1] camera shift K^-1 @ P[:, 3] (reference-camera offset).
    Returns [N_pts, 3] camera coordinates.
    """
    x, y, z, rx, ry, rz = [float(v) for v in np.asarray(pose_vec).reshape(6)]
    rot = rotation_matrix_xyz(rx, ry, rz) if rot_xz else rot_y_matrix(ry)
    pts = rot @ corners_canonical
    pts = pts + np.array([x, y, z]).reshape(3, 1) + shift.reshape(3, 1)
    return pts.T


def project_3d_to_2d(points: np.ndarray, K: np.ndarray) -> np.ndarray:
    """Pinhole projection of [N, 3] camera points -> [3, N] with rows
    (u, v, depth)."""
    projected = K @ points.T
    projected = projected.astype(np.float64).copy()
    projected[:2, :] /= projected[2, :]
    return projected


def add_visibility(joints: np.ndarray,
                   img_width: int = 1242,
                   img_height: int = 375) -> np.ndarray:
    """Append binary in-image visibility flag to [N, 2] screen points."""
    assert joints.shape[1] == 2
    inside = ((joints[:, 0] > 0.0) & (joints[:, 1] > 0.0)
              & (joints[:, 0] < img_width) & (joints[:, 1] < img_height))
    return np.hstack([joints, inside.astype(np.float64).reshape(-1, 1)])
