"""Ray-bundle initialisation.

Builds the 9 x Np initial ray state s0 = (x, y, z, vx, vy, vz, amp, phase,
pol) for every beam shape the reference supports (src/simulator/beam.py and
src/solvers-legacy/full_solver.py:547-835): 'circular', 'square',
'rectangular', 'linear', 'even' concentric-disc, and 'rect_trackers'.

Differences from the reference (all deliberate):
  * randomness via explicit jax.random keys instead of process-global numpy
    seeding (reference utils.py:8-24);
  * the azimuthal velocity angle is drawn from [0, 2*pi) instead of the
    reference's [0, pi) (beam.py:76) — with the symmetric polar angle
    chi ~ N(0, div) both give the same direction distribution;
  * 'even' is fixed: the reference version never writes the computed disc
    positions into s0 (beam.py:210-227);
  * the uniform-disc radius uses r = R*sqrt(U) (exactly uniform), equivalent
    in law to the reference's fold-the-triangle trick (full_solver.py:568-569).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from synthpy_tpu.constants import C

BEAM_TYPES = ("circular", "square", "rectangular", "linear", "even",
              "rect_trackers")


def _assemble(pos_a: jnp.ndarray, pos_b: jnp.ndarray, chi: jnp.ndarray,
              phi: jnp.ndarray, ne_extent: float, probing_direction: str,
              dtype) -> jnp.ndarray:
    """Place transverse coordinates (a, b) and polar/azimuth velocity angles
    into the 9-vector layout for the given probing direction.

    Axis conventions follow the reference (full_solver.py:574-610): the
    beam starts on the -extent face of the probing axis and travels +.
    """
    Np = pos_a.shape[0]
    v_par = C * jnp.cos(chi)
    v_p1 = C * jnp.sin(chi) * jnp.cos(phi)
    v_p2 = C * jnp.sin(chi) * jnp.sin(phi)
    start = jnp.full((Np,), -ne_extent, dtype)

    if probing_direction == "x":
        pos = (start, pos_a, pos_b)
        vel = (v_par, v_p1, v_p2)
    elif probing_direction == "y":
        pos = (pos_a, start, pos_b)
        vel = (v_p1, v_par, v_p2)
    else:  # 'z'
        pos = (pos_a, pos_b, start)
        vel = (v_p1, v_p2, v_par)

    amp = jnp.ones((Np,), dtype)
    zero = jnp.zeros((Np,), dtype)
    return jnp.stack([*pos, *vel, amp, zero, zero]).astype(dtype)


def init_beam(
    key: jax.Array,
    Np: int,
    beam_size: Union[float, Tuple[float, float]],
    divergence: float,
    ne_extent: float,
    beam_type: str = "circular",
    probing_direction: str = "z",
    n_trackers: int = 0,
    tracker_region: float = 1e-3,
    dtype=jnp.float32,
):
    """Initialise a ray bundle.

    Args:
        key: jax PRNG key.
        Np: number of rays (may be adjusted for 'even').
        beam_size: beam radius / half-width [m]; (a, b) for rectangular
            shapes.
        divergence: 1-sigma polar angle of the velocity distribution [rad].
        ne_extent: half-length of the domain along the probing axis [m];
            rays start on its -extent face.
        beam_type: one of BEAM_TYPES.
        n_trackers: for 'rect_trackers', number of rays to mark (pol = 1)
            inside the central +-tracker_region square.

    Returns:
        s0 (9, Np) ray state; for 'rect_trackers' a tuple
        (s0, tracker_indices).
    """
    if beam_type not in BEAM_TYPES:
        raise ValueError(
            f"beam_type {beam_type!r} unrecognised; use one of {BEAM_TYPES}")
    k_pos1, k_pos2, k_phi, k_chi, k_trk = jax.random.split(key, 5)
    phi = 2 * jnp.pi * jax.random.uniform(k_phi, (Np,))
    chi = divergence * jax.random.normal(k_chi, (Np,))

    if beam_type == "circular":
        t = 2 * jnp.pi * jax.random.uniform(k_pos1, (Np,))
        r = beam_size * jnp.sqrt(jax.random.uniform(k_pos2, (Np,)))
        a, b = r * jnp.cos(t), r * jnp.sin(t)

    elif beam_type == "square":
        a = beam_size * (2 * jax.random.uniform(k_pos1, (Np,)) - 1.0)
        b = beam_size * (2 * jax.random.uniform(k_pos2, (Np,)) - 1.0)

    elif beam_type in ("rectangular", "rect_trackers"):
        s1, s2 = beam_size
        a = s1 * (2 * jax.random.uniform(k_pos1, (Np,)) - 1.0)
        b = s2 * (2 * jax.random.uniform(k_pos2, (Np,)) - 1.0)

    elif beam_type == "linear":
        # uniformly along a line in the x-z plane; probing direction z
        # (reference full_solver.py:707-720)
        a = beam_size * (2 * jax.random.uniform(k_pos1, (Np,)) - 1.0)
        b = jnp.zeros((Np,))
        phi = jnp.zeros((Np,))  # velocity confined to the x-z plane
        probing_direction = "z"

    elif beam_type == "even":
        # concentric discs: centre point + rings of 6*i points
        # (reference beam.py:210-227, completed here)
        n_circles = int((-1 + np.sqrt(1 + 8 * (Np // 6))) / 2)
        n_circles = max(n_circles, 1)
        Np = 3 * (n_circles + 1) * n_circles + 1
        u = [0.0]
        t = [0.0]
        for i in range(1, n_circles + 1):
            for j in range(i * 6):
                u.append(i / n_circles)
                t.append(j * 2 * np.pi / (i * 6))
        u = jnp.asarray(u)
        t = jnp.asarray(t)
        a, b = beam_size * u * jnp.cos(t), beam_size * u * jnp.sin(t)
        phi = 2 * jnp.pi * jax.random.uniform(k_phi, (Np,))
        chi = divergence * jax.random.normal(k_chi, (Np,))

    s0 = _assemble(a.astype(dtype), b.astype(dtype), chi, phi,
                   ne_extent, probing_direction, dtype)

    if beam_type == "rect_trackers":
        pa = np.asarray(a)
        pb = np.asarray(b)
        in_region = (np.abs(pa) <= tracker_region) & (np.abs(pb)
                                                      <= tracker_region)
        region_idx = np.where(in_region)[0]
        if len(region_idx) < n_trackers:
            raise ValueError(
                "Not enough rays in the tracker region: "
                f"{len(region_idx)} < {n_trackers}")
        sel = jax.random.choice(k_trk, len(region_idx), (n_trackers,),
                                replace=False)
        tracker_indices = jnp.asarray(region_idx)[sel]
        s0 = s0.at[8, tracker_indices].set(1.0)
        return s0, tracker_indices

    return s0


class Beam:
    """Object wrapper over init_beam (parity: reference beam.py:10).

    Attributes:
        s0: (9, Np) initial state.
        Np: actual ray count (may differ from requested for 'even').
    """

    def __init__(self, Np: int, beam_size, divergence: float,
                 ne_extent: float, *, beam_type: str = "circular",
                 probing_direction: str = "z",
                 seed: Optional[int] = 0, key: Optional[jax.Array] = None,
                 n_trackers: int = 0, dtype=jnp.float32):
        if key is None:
            key = jax.random.PRNGKey(0 if seed is None else seed)
        out = init_beam(key, Np, beam_size, divergence, ne_extent,
                        beam_type=beam_type,
                        probing_direction=probing_direction,
                        n_trackers=n_trackers, dtype=dtype)
        if beam_type == "rect_trackers":
            self.s0, self.tracker_indices = out
        else:
            self.s0 = out
            self.tracker_indices = None
        self.Np = self.s0.shape[1]
        self.beam_type = beam_type
        self.probing_direction = probing_direction

    def save_rays_pos(self, fname: str) -> None:
        """Dump the (9, Np) state to .npy (parity: beam.py:305-321)."""
        np.save(fname, np.asarray(self.s0))
