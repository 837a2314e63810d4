"""Independent numpy oracles for golden-value tests.

These are naive, loop-heavy re-derivations of the reference semantics
(documented in SURVEY.md §2.4) used only to validate the JAX ops. They are
deliberately written differently from both the reference code and the
production ops.
"""

import numpy as np


def grid_xy(h, w):
    out = np.zeros((h, w, 2))
    for i in range(h):
        for j in range(w):
            out[i, j, 0] = 2 * j / (w - 1) - 1
            out[i, j, 1] = 2 * i / (h - 1) - 1
    return out


def point_segment_sqdist(p, a, b):
    """Squared distance from point p to segment a-b with the reference's
    clamp-case-split (t<=0 -> a, t>=1 -> b, else foot of perpendicular)."""
    ab = b - a
    t = np.dot(p - a, ab) / (1e-8 + np.dot(ab, ab))
    if t <= 0:
        return np.dot(p - a, p - a)
    if t >= 1:
        return np.dot(p - b, p - b)
    foot = a + t * ab
    return np.dot(p - foot, p - foot)


def draw_lines_naive(kps, size, parent_ids, child_ids, body_width, arm_ids=(11, 12, 14, 15)):
    B = kps.shape[0]
    L = len(parent_ids)
    g = grid_xy(size, size)
    out = np.zeros((B, L, size, size))
    for b in range(B):
        for l in range(L):
            a = kps[b, child_ids[l]]
            c = kps[b, parent_ids[l]]
            for i in range(size):
                for j in range(size):
                    d = point_segment_sqdist(g[i, j], a, c)
                    scale = 2.0 if (L >= 21 and l in arm_ids) else 1.0
                    out[b, l, i, j] = np.exp(-scale * d / body_width)
    return out


def patch_to_image_naive(kps, trans, image_depth, image_h, image_w, depth_scale, pelvis, is_norm=True):
    B, K, _ = kps.shape
    out = np.zeros_like(kps)
    for b in range(B):
        A = trans[b, :, :2]
        t = trans[b, :, 2]
        Ainv = np.linalg.inv(A)
        for k in range(K):
            x, y, z = kps[b, k]
            if is_norm:
                x = (x + 1) / 2 * (image_w - 1)
                y = (y + 1) / 2 * (image_h - 1)
                z = z * (image_depth - 1)
            xy = Ainv @ (np.array([x, y]) - t)
            out[b, k, :2] = xy
            out[b, k, 2] = z * depth_scale + pelvis[b, 2]
    return out


def image_to_world_naive(kps, fx, fy, u, v, trans, rot):
    B, K, _ = kps.shape
    out = np.zeros_like(kps)
    for b in range(B):
        Rinv = np.linalg.inv(rot[b])
        for k in range(K):
            x, y, z = kps[b, k]
            cam = np.array([(x - u[b, 0]) / fx[b, 0] * z, (y - v[b, 0]) / fy[b, 0] * z, z])
            out[b, k] = Rinv @ (cam - trans[b])
    return out


def world_to_image_naive(kps, fx, fy, u, v, trans, rot):
    B, K, _ = kps.shape
    out = np.zeros_like(kps)
    for b in range(B):
        for k in range(K):
            cam = rot[b] @ kps[b, k] + trans[b]
            out[b, k] = [cam[0] / cam[2] * fx[b, 0] + u[b, 0], cam[1] / cam[2] * fy[b, 0] + v[b, 0], cam[2]]
    return out


def softmax_volume(logits_khw_d):
    """(K, H, W, D) -> normalized per-joint over (H, W, D)."""
    k = logits_khw_d.shape[0]
    out = np.zeros_like(logits_khw_d)
    for i in range(k):
        e = np.exp(logits_khw_d[i] - logits_khw_d[i].max())
        out[i] = e / e.sum()
    return out


def integral_decode_multi_naive(logits_bhwc, num_joints, num_hypo, neighbor):
    """Naive multi-hypothesis decode of NHWC logits."""
    B, H, W, C = logits_bhwc.shape
    D = C // num_joints
    kps = np.zeros((B, num_hypo, num_joints, 3))
    for b in range(B):
        vol = logits_bhwc[b].reshape(H, W, num_joints, D).transpose(2, 0, 1, 3)
        p = softmax_volume(vol)  # (K, H, W, D)
        for k in range(num_joints):
            ax = p[k].sum(axis=(0, 2))  # over H, D -> (W,)
            ay = p[k].sum(axis=(1, 2))  # over W, D -> (H,)
            az = p[k].sum(axis=(0, 1))  # over H, W -> (D,)
            x = (ax * np.arange(W)).sum() / H * 2 - 1
            y = (ay * np.arange(H)).sum() / W * 2 - 1
            # peaks
            scores = []
            for i in range(1, D - 1):
                if az[i] >= az[i - 1] and az[i] >= az[i + 1]:
                    scores.append((az[i], i))
                else:
                    scores.append((0.0, i))
            scores.sort(key=lambda s: -s[0])
            pad = neighbor // 2
            azp = np.pad(az, pad)
            wzp = np.pad(az * np.arange(D), pad)
            for h in range(num_hypo):
                idx = scores[h][1]
                num = wzp[idx : idx + neighbor].sum()
                den = azp[idx : idx + neighbor].sum()
                z = num / den / D * 2 - 1
                kps[b, h, k] = [x, y, z]
    return kps
