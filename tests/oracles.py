"""Independent numpy/scipy oracle implementations used to validate JAX code.

These deliberately use a different code path (scipy Rotation, per-joint
composition without transform fusion) than robot_mpcs_tpu.models.fk so that
agreement is meaningful.
"""

import numpy as np
from scipy.spatial.transform import Rotation


def oracle_fk(model, root_link, main_end_link, target_link, q, base_type="holonomic"):
    """Position of target_link in the root frame for configuration q.

    q is assigned to actuated joints in root->main_end_link chain order
    (offset by 3 for a diffdrive base, whose pose is q[:3]).
    """
    if root_link not in model.links:
        root_link = model.root_link
    offset = 3 if base_type == "diffdrive" else 0
    arm_joints = [j.name for j in model.chain(root_link, main_end_link) if j.actuated]
    q_of = {name: q[offset + i] for i, name in enumerate(arm_joints)}

    T = np.eye(4)
    if base_type == "diffdrive":
        T[:3, :3] = Rotation.from_euler("z", q[2]).as_matrix()
        T[:2, 3] = q[:2]

    for joint in model.chain(root_link, target_link):
        To = np.eye(4)
        To[:3, :3] = Rotation.from_euler("xyz", joint.origin_rpy).as_matrix()
        To[:3, 3] = joint.origin_xyz
        T = T @ To
        if joint.actuated:
            qi = q_of[joint.name]
            Tj = np.eye(4)
            axis = np.asarray(joint.axis, dtype=float)
            axis = axis / np.linalg.norm(axis)
            if joint.type == "prismatic":
                Tj[:3, 3] = axis * qi
            else:
                Tj[:3, :3] = Rotation.from_rotvec(axis * qi).as_matrix()
            T = T @ Tj
    return T[:3, 3]
