"""Winkler EM linkage: exact integer replay of the full trajectory in
plain python, posterior separation, and the boundary clamp."""

from hebrew_ner_spark.operators import emlink
from hebrew_ner_spark.querydefs.erscore_q import _er_docs


def _py_em(patterns, rounds):
    fields = emlink.EM_FIELDS
    par = {"lam": emlink.EM_INIT_LAM}
    for f in fields:
        par[f"m_{f}"] = emlink.EM_INIT_M
        par[f"u_{f}"] = emlink.EM_INIT_U

    def clamp(x):
        return min(max(x, 1), 999)

    traj = []
    for t in range(rounds):
        rows = []
        for a, n in patterns.items():
            wm = par["lam"]
            wu = 1000 - par["lam"]
            for i, f in enumerate(fields):
                wm *= par[f"m_{f}"] if a[i] else 1000 - par[f"m_{f}"]
                wu *= par[f"u_{f}"] if a[i] else 1000 - par[f"u_{f}"]
            rows.append((a, n, wm * 1000 // (wm + wu)))
        sg = sum(n * g for _, n, g in rows)
        sn = sum(n for _, n, _ in rows)
        su = sum(n * (1000 - g) for _, n, g in rows)
        new = {"lam": clamp(sg // sn)}
        for i, f in enumerate(fields):
            new[f"m_{f}"] = clamp(
                sum(n * g * a[i] for a, n, g in rows) * 1000 // sg
            )
            new[f"u_{f}"] = clamp(
                sum(n * (1000 - g) * a[i] for a, n, g in rows) * 1000 // su
            )
        par = new
        traj.append((t, dict(par)))
    return traj, par


def test_em_trajectory_integer_parity(spark):
    docs = _er_docs(spark, "/root/testdata/sf0.001")
    pats = {
        (r.a_fp, r.a_lang, r.a_lb): r.n
        for r in emlink.agreement_patterns(docs).collect()
    }
    want, final = _py_em(pats, emlink.EM_ROUNDS)
    got = emlink.em_trajectory(docs).collect()
    assert len(got) == emlink.EM_ROUNDS
    for r in got:
        _, wpar = want[r["round"]]
        for c in ["lam"] + [
            c for f in emlink.EM_FIELDS for c in (f"m_{f}", f"u_{f}")
        ]:
            assert r[c] == wpar[c], (r["round"], c)
    # boundary clamp: nothing ever leaves [1, 999]
    for _, p in want:
        assert all(1 <= v <= 999 for v in p.values())


def test_em_posteriors_separate(spark):
    """The fitted mixture must separate full agreement from partial:
    gamma(all-agree) > gamma(any-disagree) on the planted corpus."""
    docs = _er_docs(spark, "/root/testdata/sf0.001")
    rows = emlink.em_posteriors(docs).collect()
    by_pat = {(r.a_fp, r.a_lang, r.a_lb): r.gamma_1e3 for r in rows}
    full = by_pat.get((1, 1, 1))
    assert full is not None
    for pat, g in by_pat.items():
        if pat != (1, 1, 1):
            assert g < full
