"""Sequential numpy ORCA oracle for parity testing the JAX implementation.

A direct transcription of the published ORCA algorithm (van den Berg et al.,
ISRR 2009): half-plane construction + incremental 2-D LP (linearProgram1/2)
+ max-penetration fallback (linearProgram3). Deliberately written in the
sequential style so it is an independent implementation from the vectorized
masked-loop JAX version it checks.
"""

import numpy as np

EPS = 1e-5


def det(a, b):
    return a[0] * b[1] - a[1] * b[0]


def lp1(pts, dirs, i, radius, opt, dopt):
    pt, dr = pts[i], dirs[i]
    dp = pt @ dr
    disc = dp * dp + radius * radius - pt @ pt
    if disc < 0:
        return None
    sq = np.sqrt(disc)
    tl, tr = -dp - sq, -dp + sq
    for j in range(i):
        den = det(dr, dirs[j])
        num = det(dirs[j], pt - pts[j])
        if abs(den) <= EPS:
            if num < 0:
                return None
            continue
        t = num / den
        if den >= 0:
            tr = min(tr, t)
        else:
            tl = max(tl, t)
        if tl > tr:
            return None
    if dopt:
        t = tr if opt @ dr > 0 else tl
    else:
        t = np.clip(dr @ (opt - pt), tl, tr)
    return pt + t * dr


def lp2(pts, dirs, radius, opt, dopt):
    if dopt:
        result = opt * radius
    elif opt @ opt > radius * radius:
        result = opt / np.linalg.norm(opt) * radius
    else:
        result = opt.copy()
    for i in range(len(pts)):
        if det(dirs[i], pts[i] - result) > 0:
            r = lp1(pts, dirs, i, radius, opt, dopt)
            if r is None:
                return result, i
            result = r
    return result, len(pts)


def lp3(pts, dirs, begin, radius, result):
    distance = 0.0
    for i in range(begin, len(pts)):
        if det(dirs[i], pts[i] - result) > distance:
            proj_pts, proj_dirs = [], []
            for j in range(i):
                d = det(dirs[i], dirs[j])
                if abs(d) <= EPS:
                    if dirs[i] @ dirs[j] > 0:
                        continue
                    p = 0.5 * (pts[i] + pts[j])
                else:
                    p = pts[i] + (det(dirs[j], pts[i] - pts[j]) / d) * dirs[i]
                proj_pts.append(p)
                nd = dirs[j] - dirs[i]
                proj_dirs.append(nd / np.linalg.norm(nd))
            optd = np.array([-dirs[i][1], dirs[i][0]])
            r, fail = lp2(np.array(proj_pts).reshape(-1, 2),
                          np.array(proj_dirs).reshape(-1, 2), radius, optd, True)
            if fail == len(proj_pts):
                result = r
            distance = det(dirs[i], pts[i] - result)
    return result


def orca_np(pi, vi, ri, pref, vmax, pj, vj, rj, time_horizon, dt):
    """Oracle new velocity for one agent vs all neighbors pj (no masking)."""
    pts, dirs = [], []
    for k in range(len(pj)):
        rel_pos = pj[k] - pi
        rel_vel = vi - vj[k]
        dist_sq = rel_pos @ rel_pos
        comb_r = ri + rj[k]
        comb_r2 = comb_r * comb_r
        if dist_sq > comb_r2:
            w = rel_vel - rel_pos / time_horizon
            wsq = w @ w
            dot1 = w @ rel_pos
            if dot1 < 0 and dot1 * dot1 > comb_r2 * wsq:
                wl = np.sqrt(wsq)
                uw = w / wl
                d = np.array([uw[1], -uw[0]])
                u = (comb_r / time_horizon - wl) * uw
            else:
                leg = np.sqrt(dist_sq - comb_r2)
                if det(rel_pos, w) > 0:
                    d = np.array([rel_pos[0] * leg - rel_pos[1] * comb_r,
                                  rel_pos[0] * comb_r + rel_pos[1] * leg]) / dist_sq
                else:
                    d = -np.array([rel_pos[0] * leg + rel_pos[1] * comb_r,
                                   -rel_pos[0] * comb_r + rel_pos[1] * leg]) / dist_sq
                u = (rel_vel @ d) * d - rel_vel
        else:
            w = rel_vel - rel_pos / dt
            wl = np.linalg.norm(w)
            uw = w / wl
            d = np.array([uw[1], -uw[0]])
            u = (comb_r / dt - wl) * uw
        dirs.append(d)
        pts.append(vi + 0.5 * u)
    pts, dirs = np.array(pts), np.array(dirs)
    res, fail = lp2(pts, dirs, vmax, pref, False)
    if fail < len(pts):
        res = lp3(pts, dirs, fail, vmax, res)
    return res
