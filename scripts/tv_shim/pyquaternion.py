"""pyquaternion shim: the one constructor+property the reference uses.

``Quaternion(axis=..., degrees=...)`` then ``.rotation_matrix``
(datasets/multi_view_stereo_dataset.py:165) -- standard axis-angle to
rotation matrix via the Rodrigues formula. Only reachable from the
test-time rotation-noise perturbation."""

import numpy as np


class Quaternion:
    def __init__(self, axis=None, degrees=None, radians=None):
        axis = np.asarray(axis, dtype=np.float64)
        self.axis = axis / np.linalg.norm(axis)
        if radians is None:
            radians = np.deg2rad(float(degrees))
        self.angle = float(radians)

    @property
    def rotation_matrix(self):
        kx, ky, kz = self.axis
        K = np.array([[0.0, -kz, ky], [kz, 0.0, -kx], [-ky, kx, 0.0]])
        return np.eye(3) + np.sin(self.angle) * K \
            + (1.0 - np.cos(self.angle)) * (K @ K)
