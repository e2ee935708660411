"""Independent raw-array oracle implementations of the drift statistics,
written directly from the published formulas (KS ECDF sup-difference,
W1 integral, chi²/Cramér's V bias correction per Bergsma 2013, PSI per
Lex Jansen's WUSS 2017 paper) and the reference's documented behavior.
Used to validate the engine's histogram-based kernels on random data.
"""

from collections import Counter

import numpy as np

OTHER = "Other rare categories"


def ks_raw(d1, d2):
    d1, d2 = np.sort(d1), np.sort(d2)
    allv = np.concatenate([d1, d2])
    cdf1 = np.searchsorted(d1, allv, side="right") / len(d1)
    cdf2 = np.searchsorted(d2, allv, side="right") / len(d2)
    return np.max(np.abs(cdf1 - cdf2))


def wasserstein_raw(u, v):
    """W1 between empirical distributions (scipy-equivalent integral form)."""
    u, v = np.sort(u), np.sort(v)
    allv = np.sort(np.concatenate([u, v]))
    deltas = np.diff(allv)
    u_cdf = np.searchsorted(u, allv[:-1], side="right") / len(u)
    v_cdf = np.searchsorted(v, allv[:-1], side="right") / len(v)
    return np.sum(np.abs(u_cdf - v_cdf) * deltas)


def emd_raw(d1, d2, margin=0.025):
    d1, d2 = np.asarray(d1, float), np.asarray(d2, float)
    if margin:
        lo, hi = np.quantile(d1, [margin, 1 - margin])
        d1 = d1[(d1 >= lo) & (d1 <= hi)]
        lo, hi = np.quantile(d2, [margin, 1 - margin])
        d2 = d2[(d2 >= lo) & (d2 <= hi)]
    vmax = max(d1.max(), d2.max())
    vmin = min(d1.min(), d2.min())
    if vmax == vmin:
        return 0.0
    d1 = (d1 - vmin) / (vmax - vmin)
    d2 = (d2 - vmin) / (vmax - vmin)
    return wasserstein_raw(d1, d2)


def bin_raw(d1, d2, min_ratio=0.0, max_cats=None, sort_by="dist1"):
    c1, c2 = Counter(d1), Counter(d2)
    n1, n2 = len(d1), len(d2)
    cats = sorted(set(c1) | set(c2), key=str)
    if max_cats is not None and len(cats) > max_cats:
        if sort_by == "dist1":
            keyc = c1
        elif sort_by == "dist2":
            keyc = c2
        else:
            keyc = Counter({k: abs(c1[k] - c2[k]) for k in cats})
        cats = [k for k, _ in sorted(keyc.items(), key=lambda x: (-x[1], str(x[0])))][:max_cats]
        c1 = Counter({k: c1[k] for k in cats})
        c1[OTHER] = n1 - sum(c1.values())
        c2 = Counter({k: c2[k] for k in cats})
        c2[OTHER] = n2 - sum(c2.values())
    for cat in list(cats):
        if c1[cat] < n1 * min_ratio:
            c1[OTHER] += c1[cat]
            c2[OTHER] += c2[cat]
            cats.remove(cat)
    if c1[OTHER] > min_ratio * n1 or c2[OTHER] > min_ratio * n2:
        cats.append(OTHER)
    return (
        np.array([c1[k] for k in cats], float),
        np.array([c2[k] for k in cats], float),
        cats,
    )


def chi2_raw(obs):
    obs = np.asarray(obs, float)
    row = obs.sum(1, keepdims=True)
    col = obs.sum(0, keepdims=True)
    n = obs.sum()
    exp = row @ col / n
    dof = (obs.shape[0] - 1) * (obs.shape[1] - 1)
    if dof == 1:
        obs = obs + 0.5 * np.sign(exp - obs)
    return np.sum((obs - exp) ** 2 / exp)


def downsize(c1, c2, round_to_int=True):
    s1, s2 = c1.sum(), c2.sum()
    if s1 > s2:
        c1 = c1 * (s2 / s1)
    elif s1 < s2:
        c2 = c2 * (s1 / s2)
    return (np.round(c1), np.round(c2)) if round_to_int else (c1, c2)


def cramers_v_raw(d1, d2, min_ratio=0.0, max_cats=None, sort_by="dist1"):
    c1, c2, cats = bin_raw(d1, d2, min_ratio, max_cats, sort_by)
    if len(cats) == 1:
        return 0.0
    c1, c2 = downsize(c1, c2)
    m = np.vstack([c1, c2]).astype(int)
    m = m[:, (m != 0).any(0)]
    chi2 = chi2_raw(m)
    n = m.sum()
    phi2 = chi2 / n
    r, k = m.shape
    phi2corr = max(0, phi2 - (k - 1) * (r - 1) / (n - 1))
    rcorr = r - (r - 1) ** 2 / (n - 1)
    kcorr = k - (k - 1) ** 2 / (n - 1)
    return np.sqrt(phi2corr / min(kcorr - 1, rcorr - 1))


def psi_raw(d1, d2, min_ratio=0.0, max_cats=None, sort_by="dist1"):
    e, a, _ = bin_raw(d1, d2, min_ratio, max_cats, sort_by)
    se, sa = e.sum(), a.sum()
    out = 0.0
    for i in range(len(e)):
        ep = max(e[i] / se, 0.01)
        ap = max(a[i] / sa, 0.01)
        out += (ep - ap) * np.log(ep / ap)
    return out
