"""Single-particle convergence run modes (the reference declared these but
never implemented them — src/pusher.h:192-195)."""

from pinc_tpu.pumodes import interp_convergence, particle_convergence


def test_leapfrog_order_two():
    r = particle_convergence(L=64, n_periods=1.0, dts=(0.2, 0.1, 0.05))
    assert all(o > 1.8 for o in r["orders"]), r


def test_interp_orders():
    r = interp_convergence(sizes=(16, 32, 64), n_samples=2048)
    assert 0.8 < r["order_ngp"] < 1.2, r
    assert 1.8 < r["order_cic"] < 2.2, r
    # CIC beats NGP at every resolution
    assert all(c < n for c, n in zip(r["cic"], r["ngp"]))
