"""Pure-numpy SO(3)/SE(3) reference implementation for test construction.

Two purposes: (1) building synthetic graphs without eager JAX dispatch
(which is very slow in this environment), and (2) an independent
implementation to cross-check ``graph_slam_tpu.core`` against.
"""

import numpy as np


def hat(w):
    return np.array([
        [0.0, -w[2], w[1]],
        [w[2], 0.0, -w[0]],
        [-w[1], w[0], 0.0],
    ])


def so3_exp(w):
    w = np.asarray(w, float)
    th = np.linalg.norm(w)
    W = hat(w)
    if th < 1e-10:
        return np.eye(3) + W + 0.5 * W @ W
    return (np.eye(3) + np.sin(th) / th * W
            + (1 - np.cos(th)) / th**2 * (W @ W))


def so3_log(R):
    c = np.clip((np.trace(R) - 1) * 0.5, -1.0, 1.0)
    th = np.arccos(c)
    v = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    if th < 1e-7:
        return 0.5 * v
    if th > np.pi - 1e-6:
        # near pi: use symmetric part
        A = (R + np.eye(3)) * 0.5
        axis = np.sqrt(np.clip(np.diag(A), 0, None))
        k = int(np.argmax(axis))
        s = np.sign(A[k]) * axis
        s[k] = axis[k]
        axis = s / np.linalg.norm(s)
        if np.dot(axis, v) < 0:
            axis = -axis
        return th * axis
    return th / (2 * np.sin(th)) * v


def jleft(w):
    w = np.asarray(w, float)
    th = np.linalg.norm(w)
    W = hat(w)
    if th < 1e-10:
        return np.eye(3) + 0.5 * W + W @ W / 6.0
    return (np.eye(3) + (1 - np.cos(th)) / th**2 * W
            + (th - np.sin(th)) / th**3 * (W @ W))


def se3_exp(xi):
    xi = np.asarray(xi, float)
    R = so3_exp(xi[:3])
    t = jleft(xi[:3]) @ xi[3:]
    return R, t


def se3_log(R, t):
    w = so3_log(R)
    v = np.linalg.solve(jleft(w), t)
    return np.concatenate([w, v])


def compose(a, b):
    Ra, ta = a
    Rb, tb = b
    return Ra @ Rb, Ra @ tb + ta


def inverse(a):
    R, t = a
    return R.T, -R.T @ t


def between(a, b):
    return compose(inverse(a), b)


def retract(a, xi):
    return compose(a, se3_exp(xi))


def adjoint(R, t):
    A = np.zeros((6, 6))
    A[:3, :3] = R
    A[3:, 3:] = R
    A[3:, :3] = hat(t) @ R
    return A
