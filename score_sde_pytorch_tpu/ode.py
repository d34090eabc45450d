"""On-device adaptive Dormand–Prince RK45 ODE solver.

Replaces the reference's scipy.integrate.solve_ivp bridge
(/root/reference/sampling.py:466-473, likelihood.py:94-99), which crosses the
host↔device boundary twice per NFE — the single worst performance defect of
the reference (SURVEY.md §3.3). Here the whole adaptive loop runs inside one
`lax.while_loop` under jit: step-size control, acceptance, and the FSAL
(first-same-as-last) optimization, with the same error model as scipy's RK45
(rms norm of error/(atol + rtol·max(|y|,|y_new|)), PI-free step factor
0.9·err^(−1/5) clamped to [0.2, 10]).

State ``y`` is an arbitrary pytree (the likelihood path integrates the
augmented [x; Δlogp] system as a 2-tuple). Acceptance is batch-uniform —
the whole system shares one step size, exactly like scipy treats the
flattened system (needed to reproduce the reference's FID(ODE)/NLL numbers).
"""
from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

# Dormand–Prince 5(4) Butcher tableau (python floats: traced as literals).
_C = [0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0]
_A = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
    [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
]
# 5th-order solution weights == last row of A (FSAL).
_B = [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0]
# Error weights: b5 − b4.
_E = [71 / 57600, 0.0, -71 / 16695, 71 / 1920, -17253 / 339200,
      22 / 525, -1 / 40]

_SAFETY = 0.9
_MIN_FACTOR = 0.2
_MAX_FACTOR = 10.0
_ORDER_EXP = -1.0 / 5.0
_MIN_STEP = 1e-6  # float32 time resolution floor near t ~ 1


def _tree_axpy(a, xs, ys):
  return jax.tree.map(lambda x, y: a * x + y, xs, ys)


def _weighted_sum(ks, ws):
  """sum_i ws[i] * ks[i] over a list of pytrees."""
  out = jax.tree.map(lambda k: ws[0] * k, ks[0])
  for i in range(1, len(ks)):
    out = jax.tree.map(lambda o, k, w=ws[i]: o + w * k, out, ks[i])
  return out


def _rms_norm(tree) -> Array:
  sq = sum(jnp.sum(jnp.square(l)) for l in jax.tree.leaves(tree))
  n = sum(l.size for l in jax.tree.leaves(tree))
  return jnp.sqrt(sq / n)


def _error_norm(err, y0, y1, rtol, atol) -> Array:
  def scale_err(e, a, b):
    scale = atol + rtol * jnp.maximum(jnp.abs(a), jnp.abs(b))
    return e / scale

  scaled = jax.tree.map(scale_err, err, y0, y1)
  return _rms_norm(scaled)


#: status codes returned by :func:`odeint_rk45`
STATUS_OK = 0          # reached t1 within tolerance
STATUS_MAX_STEPS = 1   # max_steps exhausted (incl. err stuck at inf on the
                       # step floor) — the returned y is NOT y(t1)


def odeint_rk45(func: Callable[[Any, Array], Any], y0: Any, t0: float,
                t1: float, rtol: float = 1e-5, atol: float = 1e-5,
                max_steps: int = 10000) -> Tuple[Any, Array, Array]:
  """Integrate ``dy/dt = func(y, t)`` from t0 to t1 (either direction).

  Returns ``(y(t1), nfe, status)``. Fully jittable; ``y0`` may be any pytree
  of float arrays. ``status`` is ``STATUS_OK`` (0) on convergence and
  ``STATUS_MAX_STEPS`` (1) when the loop ran out of steps before reaching
  ``t1`` — in that case ``y`` is the state at the last accepted time, not
  ``y(t1)``, and callers must not treat it as a finished solution (the
  reference's scipy solve_ivp signals this via ``sol.status``/raise;
  reference likelihood.py:94-99).
  """
  direction = 1.0 if t1 >= t0 else -1.0
  t0 = jnp.asarray(t0, jnp.float32)
  t1 = jnp.asarray(t1, jnp.float32)

  f0 = func(y0, t0)

  # --- initial step size (scipy _select_initial_step) ---
  def scale_of(y):
    return jax.tree.map(lambda l: atol + rtol * jnp.abs(l), y)

  interval = jnp.abs(t1 - t0)
  scale = scale_of(y0)
  d0 = _rms_norm(jax.tree.map(lambda a, s: a / s, y0, scale))
  d1 = _rms_norm(jax.tree.map(lambda a, s: a / s, f0, scale))
  h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
  # Never probe outside the integration interval (stiff RHS such as the VE
  # SDE's geometric sigma overflow immediately past t1).
  h0 = jnp.minimum(h0, interval)
  y1_guess = _tree_axpy(h0 * direction, f0, y0)
  f1 = func(y1_guess, t0 + h0 * direction)
  d2 = _rms_norm(jax.tree.map(lambda a, b, s: (a - b) / s, f1, f0,
                              scale)) / h0
  d2 = jnp.where(jnp.isfinite(d2), d2, 1.0 / h0)  # overflow → force small h
  h1 = jnp.where(jnp.maximum(d1, d2) <= 1e-15,
                 jnp.maximum(1e-6, h0 * 1e-3),
                 (0.01 / jnp.maximum(d1, d2)) ** (1.0 / 5.0))
  h_init = jnp.clip(jnp.minimum(100 * h0, h1), _MIN_STEP, interval)

  def cond(carry):
    t, y, f, h, nfe, steps, done = carry
    return jnp.logical_and(jnp.logical_not(done), steps < max_steps)

  def body(carry):
    t, y, f, h, nfe, steps, done = carry
    remaining = jnp.abs(t1 - t)
    h_eff = jnp.minimum(h, remaining)
    is_last = h >= remaining

    # 7 stages, FSAL: k[0] = f carried from the previous accepted step.
    ks = [f]
    for i in range(1, 7):
      yi = y
      for j, a in enumerate(_A[i]):
        yi = _tree_axpy(h_eff * direction * a, ks[j], yi)
      ks.append(func(yi, t + _C[i] * h_eff * direction))

    y_new = y
    for i in range(7):
      if _B[i] != 0.0:
        y_new = _tree_axpy(h_eff * direction * _B[i], ks[i], y_new)
    err = _weighted_sum(ks, [h_eff * e for e in _E])
    err_norm = _error_norm(err, y, y_new, rtol, atol)
    # Overflowed/NaN step → treat as infinitely wrong (reject, shrink).
    err_norm = jnp.where(jnp.isfinite(err_norm), err_norm, jnp.inf)

    accept = err_norm <= 1.0
    factor = jnp.where(
        err_norm <= 0.0, _MAX_FACTOR,
        jnp.clip(_SAFETY * err_norm ** _ORDER_EXP, _MIN_FACTOR, _MAX_FACTOR))
    factor = jnp.where(accept, factor, jnp.minimum(1.0, factor))
    # Floor the step at the float32 time-resolution limit so t always
    # advances (a smaller step cannot change t near t≈1 in fp32).
    h_next = jnp.maximum(h_eff * factor, _MIN_STEP)

    t_new = jnp.where(accept, t + h_eff * direction, t)
    y_out = jax.tree.map(lambda a, b: jnp.where(accept, b, a), y, y_new)
    # FSAL: stage 7 is f(y_new, t_new)
    f_out = jax.tree.map(lambda a, b: jnp.where(accept, b, a), f, ks[6])
    done_new = jnp.logical_and(accept, is_last)
    return (t_new, y_out, f_out, h_next, nfe + 6, steps + 1, done_new)

  init = (t0, y0, f0, h_init, jnp.asarray(2, jnp.int32),
          jnp.asarray(0, jnp.int32), jnp.asarray(False))
  t, y, f, h, nfe, steps, done = jax.lax.while_loop(cond, body, init)
  status = jnp.where(done, jnp.asarray(STATUS_OK, jnp.int32),
                     jnp.asarray(STATUS_MAX_STEPS, jnp.int32))
  return y, nfe, status
