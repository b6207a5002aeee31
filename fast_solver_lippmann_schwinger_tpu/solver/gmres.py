"""Device-resident restarted GMRES with left preconditioning.

Replaces the reference's dependency on ``IterativeSolvers.gmres!`` (driven at
``examples/example.jl:85``, ``tests/plasma_example.jl:164``): the whole outer
Krylov loop — Arnoldi with modified Gram-Schmidt, Givens rotations, restarts,
residual logging — compiles to a single XLA program via ``lax.while_loop``,
so no host round-trips happen between iterations.

The convergence criterion matches the reference's default: relative tolerance
on the norm of the left-preconditioned residual.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax


class GMRESInfo(NamedTuple):
    residuals: jnp.ndarray   # (maxiter + 1,) preconditioned residual norms,
                             # residuals[0] is the initial norm; trailing
                             # entries are zero (count nonzeros for iters,
                             # like the drivers' ``countnz(resnorm)``)
    n_iterations: jnp.ndarray
    converged: jnp.ndarray


def _identity(x):
    return x


def gmres(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    preconditioner: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    x0: Optional[jnp.ndarray] = None,
    rtol: float = 1e-8,
    atol: float = 0.0,
    restart: int = 20,
    maxiter: int = 200,
):
    """Solve ``A x = b`` with restarted, left-preconditioned GMRES.

    ``matvec`` and ``preconditioner`` are traceable callables on vectors of
    ``b``'s shape.  Returns ``(x, GMRESInfo)``.
    """
    M = preconditioner if preconditioner is not None else _identity
    n = b.shape[0]
    restart = min(restart, n)
    maxiter = min(maxiter, 10 * n)
    dtype = b.dtype
    rdtype = jnp.real(b).dtype

    # The preconditioner apply dominates solve cost (a full DDM double
    # sweep at production sizes); compute M(b) ONCE and reuse it as the
    # convergence scale, the initial residual (x0 = 0 default), and the
    # first restart cycle's residual — XLA does not CSE identical sweep
    # scans, and the naive formulation was measured to pay ~3 preconditioner
    # applies of pure overhead per solve at the 801 headline.
    if x0 is None:
        x0 = jnp.zeros_like(b)
        r0 = M(b)
        mb_norm = jnp.linalg.norm(r0)
    else:
        r0 = M(b - matvec(x0))
        mb_norm = jnp.linalg.norm(M(b))
    tol = jnp.maximum(rtol * mb_norm, atol).astype(rdtype)

    n_cycles = -(-maxiter // restart)

    def arnoldi_step(carry, _):
        """One inner GMRES iteration over fixed-size (restart+1, n) basis."""
        V, R, g, cs, sn, j, resnorm, active = carry

        def do_step(args):
            V, R, g, cs, sn, j, resnorm = args
            w = M(matvec(V[j]))
            # Modified Gram-Schmidt against all stored basis vectors; rows
            # past j are zero so the extra dots are exact no-ops.
            def mgs(i, wh):
                w, h = wh
                hi = jnp.vdot(V[i], w)
                return (w - hi * V[i], h.at[i].set(hi))

            h0 = jnp.zeros((restart + 1,), dtype=dtype)
            w, h = lax.fori_loop(0, restart + 1, mgs, (w, h0))
            hj1 = jnp.linalg.norm(w)
            h = h.at[j + 1].set(hj1.astype(dtype))
            V = V.at[j + 1].set(jnp.where(hj1 > 0, w / hj1.astype(dtype), w))

            # apply accumulated Givens rotations to the new column
            def rot(i, h):
                t = cs[i] * h[i] + sn[i] * h[i + 1]
                h = h.at[i + 1].set(-jnp.conj(sn[i]) * h[i] + cs[i] * h[i + 1])
                return h.at[i].set(t)

            h = lax.fori_loop(0, j, rot, h)

            # new rotation zeroing h[j+1]
            a, bb = h[j], h[j + 1]
            denom = jnp.sqrt(jnp.abs(a) ** 2 + jnp.abs(bb) ** 2)
            safe = denom > 0
            c_new = jnp.where(safe, jnp.abs(a) / jnp.maximum(denom, 1e-300), 1.0)
            phase = jnp.where(
                jnp.abs(a) > 0, a / jnp.maximum(jnp.abs(a), 1e-300), 1.0
            ).astype(dtype)
            s_new = jnp.where(
                safe, phase * jnp.conj(bb) / jnp.maximum(denom, 1e-300), 0.0
            ).astype(dtype)

            h = h.at[j].set(c_new * a + s_new * bb)
            h = h.at[j + 1].set(0.0)
            cs2 = cs.at[j].set(c_new.astype(dtype))
            sn2 = sn.at[j].set(s_new)
            g2 = g.at[j + 1].set(-jnp.conj(s_new) * g[j])
            g2 = g2.at[j].set(c_new * g[j])
            R2 = R.at[:, j].set(h)
            return V, R2, g2, cs2, sn2, j + 1, jnp.abs(g2[j + 1]).astype(rdtype)

        V, R, g, cs, sn, j, resnorm = lax.cond(
            active,
            do_step,
            lambda args: args,
            (V, R, g, cs, sn, j, resnorm),
        )
        new_active = active & (resnorm > tol)
        rec = jnp.where(active, resnorm, jnp.zeros((), rdtype))
        return (V, R, g, cs, sn, j, resnorm, new_active), rec

    def cycle(carry, _):
        x, total_res, cycle_idx, done = carry

        def run(args):
            x, total_res = args
            # the first cycle's residual is exactly the precomputed r0
            # (x is still x0 there) — only later restarts recompute
            r = lax.cond(
                cycle_idx == 0,
                lambda _: r0.astype(dtype),
                lambda _: M(b - matvec(x)),
                None,
            )
            beta = jnp.linalg.norm(r)
            V = jnp.zeros((restart + 1, n), dtype=dtype)
            V = V.at[0].set(jnp.where(beta > 0, r / beta.astype(dtype), r))
            R = jnp.zeros((restart + 1, restart + 1), dtype=dtype)
            g = jnp.zeros((restart + 1,), dtype=dtype)
            g = g.at[0].set(beta.astype(dtype))
            cs = jnp.zeros((restart,), dtype=dtype)
            sn = jnp.zeros((restart,), dtype=dtype)

            init = (V, R, g, cs, sn, 0, beta.astype(rdtype), beta > tol)
            (V, R, g, cs, sn, j, resnorm, _), recs = lax.scan(
                arnoldi_step, init, None, length=restart
            )

            # solve the (masked) triangular system R y = g
            filled = jnp.arange(restart) < j
            Rsq = R[:restart, :restart]
            Rsq = jnp.where(
                jnp.eye(restart, dtype=bool) & ~filled[None, :],
                jnp.ones((), dtype),
                jnp.where(filled[None, :], Rsq, 0.0),
            )
            gv = jnp.where(filled, g[:restart], 0.0)
            y = jax.scipy.linalg.solve_triangular(Rsq, gv, lower=False)
            x2 = x + V[:restart].T @ y
            return x2, recs, resnorm

        def skip(args):
            x, total_res = args
            return x, jnp.zeros((restart,), rdtype), jnp.zeros((), rdtype)

        x, recs, resnorm = lax.cond(~done, run, skip, (x, total_res))
        total_res = lax.dynamic_update_slice(
            total_res, recs, (1 + cycle_idx * restart,)
        )
        done = done | (resnorm <= tol)
        return (x, total_res, cycle_idx + 1, done), None

    residuals0 = jnp.zeros((1 + n_cycles * restart,), rdtype)
    beta0 = jnp.linalg.norm(r0).astype(rdtype)
    residuals0 = residuals0.at[0].set(beta0)

    (x, residuals, _, done), _ = lax.scan(
        cycle, (x0, residuals0, 0, beta0 <= tol), None, length=n_cycles
    )
    n_iters = jnp.sum(residuals[1:] > 0)
    return x, GMRESInfo(residuals=residuals, n_iterations=n_iters, converged=done)


def gmres_batched(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    B: jnp.ndarray,
    preconditioner: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    x0: Optional[jnp.ndarray] = None,
    rtol: float = 1e-8,
    atol: float = 0.0,
    restart: int = 20,
    maxiter: int = 200,
):
    """Batched restarted GMRES: solve ``A x_r = b_r`` for all rows of ``B``
    (R, N) in ONE Krylov loop whose operator and preconditioner are applied
    to the WHOLE (R, N) batch at once.

    This is NOT ``vmap(gmres)``: the joint application is the point — the
    preconditioner can be a batch-level program such as the
    wavefront-pipelined sharded sweep (``parallel/sharded.py``), which needs
    all R right-hand sides simultaneously to fill its pipeline.  The
    reference solves its two incident directions serially
    (``tests/plasma_example.jl:160,172``); batching the outer Krylov over
    directions is the TPU-idiomatic replacement.

    Per-RHS Arnoldi/Givens state is carried with a trailing batch axis;
    converged systems freeze (masked updates) while the batch keeps
    iterating until ALL converge or the budget runs out.  Returns
    ``(X, GMRESInfo)`` with leading batch axes (residuals (R, hist)).
    """
    M = preconditioner if preconditioner is not None else _identity
    R, n = B.shape
    restart = min(restart, n)
    dtype = B.dtype
    rdtype = jnp.real(B).dtype

    def norms(W):
        return jnp.sqrt(jnp.sum(jnp.abs(W) ** 2, axis=-1)).astype(rdtype)

    def vdots(Vi, W):
        return jnp.sum(jnp.conj(Vi) * W, axis=-1)

    # One M(B) apply shared between the convergence scale, the initial
    # residual, and the first restart cycle (see the single-RHS ``gmres``:
    # the batched preconditioner is a full joint sweep — paying it three
    # times per solve was measured overhead, not hypothetical).
    if x0 is None:
        x0 = jnp.zeros_like(B)
        r0 = M(B)
        mb_norms = norms(r0)
    else:
        r0 = M(B - matvec(x0))
        mb_norms = norms(M(B))
    tol = jnp.maximum(rtol * mb_norms, atol)              # (R,)
    n_cycles = -(-maxiter // restart)

    def arnoldi_step(carry, _):
        # V: (restart+1, R, N); Rm: (restart+1, restart+1, R);
        # g: (restart+1, R); cs/sn: (restart, R); jcount/resnorm/active: (R,)
        # Once EVERY system has converged the whole step is skipped (the
        # single-RHS ``gmres`` has the same early exit) — without it the
        # remaining steps of the restart cycle would keep paying full
        # batched matvec + preconditioner applies for frozen iterates.
        new_carry, rec = lax.cond(
            jnp.any(carry[-1]), _arnoldi_active, _arnoldi_skip, carry
        )
        return new_carry, rec

    def _arnoldi_skip(carry):
        return carry, jnp.zeros((R,), rdtype)

    def _arnoldi_active(carry):
        V, Rm, g, cs, sn, jcount, resnorm, active = carry
        j = jnp.max(jnp.where(active, jcount, 0))
        w = M(matvec(V[j]))                               # joint batch apply

        def mgs(i, wh):
            w, h = wh
            hi = vdots(V[i], w)
            return (w - hi[:, None] * V[i], h.at[i].set(hi))

        h0 = jnp.zeros((restart + 1, R), dtype=dtype)
        w, h = lax.fori_loop(0, restart + 1, mgs, (w, h0))
        hj1 = norms(w)
        vnew = jnp.where(
            (hj1 > 0)[:, None], w / jnp.maximum(hj1, 1e-300)[:, None], w
        ).astype(dtype)
        V = V.at[j + 1].set(jnp.where(active[:, None], vnew, V[j + 1]))
        h = h.at[j + 1].set(hj1.astype(dtype))

        def rot(i, h):
            t = cs[i] * h[i] + sn[i] * h[i + 1]
            h = h.at[i + 1].set(-jnp.conj(sn[i]) * h[i] + cs[i] * h[i + 1])
            return h.at[i].set(t)

        h = lax.fori_loop(0, j, rot, h)

        a, bb = h[j], h[j + 1]                            # (R,)
        denom = jnp.sqrt(jnp.abs(a) ** 2 + jnp.abs(bb) ** 2)
        safe = denom > 0
        c_new = jnp.where(safe, jnp.abs(a) / jnp.maximum(denom, 1e-300), 1.0)
        phase = jnp.where(
            jnp.abs(a) > 0, a / jnp.maximum(jnp.abs(a), 1e-300), 1.0
        ).astype(dtype)
        s_new = jnp.where(
            safe, phase * jnp.conj(bb) / jnp.maximum(denom, 1e-300), 0.0
        ).astype(dtype)

        h = h.at[j].set(c_new * a + s_new * bb)
        h = h.at[j + 1].set(0.0)
        upd = lambda old, new: jnp.where(active, new, old)
        cs2 = cs.at[j].set(upd(cs[j], c_new.astype(dtype)))
        sn2 = sn.at[j].set(upd(sn[j], s_new))
        g2 = g.at[j + 1].set(upd(g[j + 1], -jnp.conj(s_new) * g[j]))
        g2 = g2.at[j].set(upd(g[j], c_new * g[j]))
        Rm2 = Rm.at[:, j].set(jnp.where(active[None, :], h, Rm[:, j]))
        res_new = jnp.where(active, jnp.abs(g2[j + 1]).astype(rdtype), resnorm)
        jcount2 = jnp.where(active, jcount + 1, jcount)
        rec = jnp.where(active, res_new, jnp.zeros((), rdtype))
        new_active = active & (res_new > tol)
        return (V, Rm2, g2, cs2, sn2, jcount2, res_new, new_active), rec

    def cycle(carry, cycle_idx):
        x, total_res, done = carry
        x, recs, resnorm = lax.cond(
            ~jnp.all(done), _cycle_run, _cycle_skip, (x, done, cycle_idx)
        )
        total_res = lax.dynamic_update_slice(
            total_res, jnp.moveaxis(recs, 0, 1), (0, 1 + cycle_idx * restart)
        )
        done = done | (resnorm <= tol)
        return (x, total_res, done), None

    def _cycle_skip(args):
        x, done, _ = args
        return (x, jnp.zeros((restart, R), rdtype),
                jnp.zeros((R,), rdtype))

    def _cycle_run(args):
        x, done, cycle_idx = args
        r = lax.cond(
            cycle_idx == 0,
            lambda _: r0.astype(dtype),
            lambda _: M(B - matvec(x)),
            None,
        )
        beta = norms(r)                                   # (R,)
        V = jnp.zeros((restart + 1, R, n), dtype=dtype)
        V = V.at[0].set(
            jnp.where((beta > 0)[:, None],
                      r / jnp.maximum(beta, 1e-300)[:, None], r).astype(dtype)
        )
        Rm = jnp.zeros((restart + 1, restart + 1, R), dtype=dtype)
        g = jnp.zeros((restart + 1, R), dtype=dtype)
        g = g.at[0].set(beta.astype(dtype))
        cs = jnp.zeros((restart, R), dtype=dtype)
        sn = jnp.zeros((restart, R), dtype=dtype)
        jcount = jnp.zeros((R,), jnp.int32)
        active0 = (~done) & (beta > tol)

        init = (V, Rm, g, cs, sn, jcount, beta, active0)
        (V, Rm, g, cs, sn, jcount, resnorm, _), recs = lax.scan(
            arnoldi_step, init, None, length=restart
        )   # recs: (restart, R)

        # per-RHS masked triangular solve Rm y = g
        filled = jnp.arange(restart)[:, None] < jcount[None, :]  # (restart, R)

        def solve_one(Rsq_r, g_r, filled_r):
            Rsq_r = jnp.where(
                jnp.eye(restart, dtype=bool) & ~filled_r[None, :],
                jnp.ones((), dtype),
                jnp.where(filled_r[None, :], Rsq_r, 0.0),
            )
            gv = jnp.where(filled_r, g_r, 0.0)
            return jax.scipy.linalg.solve_triangular(Rsq_r, gv, lower=False)

        y = jax.vmap(solve_one)(
            jnp.moveaxis(Rm[:restart, :restart], -1, 0),
            jnp.moveaxis(g[:restart], -1, 0),
            jnp.moveaxis(filled, -1, 0),
        )                                                 # (R, restart)
        x2 = x + jnp.einsum("jrn,rj->rn", V[:restart], y.astype(dtype))
        x = jnp.where(done[:, None], x, x2)
        return x, recs, resnorm

    residuals0 = jnp.zeros((R, 1 + n_cycles * restart), rdtype)
    beta0 = norms(r0)
    residuals0 = residuals0.at[:, 0].set(beta0)

    (x, residuals, done), _ = lax.scan(
        cycle, (x0, residuals0, beta0 <= tol), jnp.arange(n_cycles)
    )
    n_iters = jnp.sum(residuals[:, 1:] > 0, axis=1)
    return x, GMRESInfo(residuals=residuals, n_iterations=n_iters, converged=done)
