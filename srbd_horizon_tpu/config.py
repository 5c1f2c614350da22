"""Typed configuration — the TPU-native replacement for the reference's ROS
parameter server (reference: launch/SRBD_kangaroo_line_feet.launch:16-33 and
~20 `rospy.get_param` call sites in python/prb.py:142-150,174 and
python/isrbd_example.py:174-177,358).

All gains live in a frozen dataclass so that problem construction is pure;
gains that the reference mutates online (`orientation_tracking_gain`,
`Wo`) are *parameters* of the OCP instead (node-indexed arrays), matching the
reference's compile-once/mutate-params contract (SURVEY.md §3.5).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SRBDConfig:
    """Static configuration of the SRBD/LIP MPC problems.

    Field provenance (reference file:line):
      ns, T                  dsrbd_example.py:30-31
      contact_model,
      number_of_legs         launch/SRBD_kangaroo_line_feet.launch:16-17
      r_tracking_gain        prb.py:142
      rdot_tracking_gain     prb.py:145
      w_tracking_gain        prb.py:146
      rel_position_gain      prb.py:147
      force_switch_weight    prb.py:148
      min_qddot_gain         prb.py:149
      min_f_gain             prb.py:150
      zmp_tracking_gain      prb.py:361
      friction_cone_coefficient  prb.py:174
      force_scaling          prb.py:98
      lip_height (0.88)      prb.py:317  (eta2 = 9.81/0.88)
      hz                     dsrbd_example.py:48
      max_contact_force      isrbd_example.py:174
      rz_tracking_gain (isrbd)   isrbd_example.py:229
    """

    # horizon
    ns: int = 20
    T: float = 1.0

    # contact topology: nc = number_of_legs * contact_model
    contact_model: int = 2
    number_of_legs: int = 2

    # cost gains (defaults = reference defaults)
    r_tracking_gain: float = 1e3
    rdot_tracking_gain: float = 1e4
    w_tracking_gain: float = 1e4
    rel_position_gain: float = 1e4
    force_switch_weight: float = 1e2
    min_qddot_gain: float = 1e0
    min_f_gain: float = 1e-2
    zmp_tracking_gain: float = 1e3
    rz_tracking_gain_isrbd: float = 2e3

    # physics
    friction_cone_coefficient: float = 0.8
    force_scaling: float = 1000.0
    gravity: float = 9.81
    lip_height: float = 0.88

    # runtime
    hz: float = 10.0
    max_contact_force: float = 1000.0
    max_contact_velocity: float = 10.0

    # numerics
    dtype: jnp.dtype = jnp.float32

    @property
    def nc(self) -> int:
        return self.number_of_legs * self.contact_model

    @property
    def dt(self) -> float:
        return self.T / self.ns

    @property
    def eta2(self) -> float:
        """LIP natural frequency squared (prb.py:317)."""
        return self.gravity / self.lip_height


@dataclasses.dataclass(frozen=True)
class DDPOptions:
    """MS-DDP solver options, mirroring the observable `pyddp.DdpSolverOptions`
    surface (reference ddp.py:14-35) plus the example overrides
    (dsrbd_example.py:56-58: max_iters=100, alpha_converge_threshold=1e-12,
    beta=1e-3; adapter defaults ddp.py:20-29)."""

    max_iters: int = 100
    alpha_0: float = 1.0
    alpha_converge_threshold: float = 1e-12
    line_search_decrease_factor: float = 0.5
    beta: float = 1e-3                 # Armijo sufficient-decrease parameter
    cost_reduction_ths: float = 1e-9   # stop when relative cost reduction below
    mu0: float = 1e-6                  # Levenberg regularization on Quu
    constraint_weight: float = 1e6     # equality-constraint penalty (ddp.py:181)
    # TPU-specific: maximum backtracking steps per iteration (bounds the
    # line-search while_loop; 2^-40 < 1e-12 covers the reference threshold)
    max_line_search_steps: int = 40
    # Line-search execution strategy (TPU-specific; result-equivalent):
    #   "parallel":   evaluate K candidate step sizes α₀·factorᵏ per batched
    #                 rollout fan; if every candidate rejects, deepen with
    #                 further width-K fans (bounded while_loop) down to the
    #                 α floor implied by max_line_search_steps — covering
    #                 the reference's backtrack-to-1e-12 semantics
    #                 (dsrbd_example.py:57) at constant warm-path latency.
    #   "sequential": classic backtracking while_loop (reference semantics
    #                 ddp.py:26-28 literally).
    # Both accept the same α whenever sequential terminates within
    # max_line_search_steps trials.
    line_search_mode: str = "parallel"
    # Number of simultaneous α candidates per fan in parallel mode (the
    # fan widens latency by ~width rollouts; deepening fans only run when
    # every candidate of the previous fan was rejected)
    parallel_line_search_width: int = 4
    # Deepening-fan compaction for the batched path: when >0 and at most
    # this many members reject the α₀ fast-path trial, the backtracking
    # fan gathers JUST those members and deepens on the compacted
    # sub-batch (width × compact lanes instead of width × B) before
    # scattering the accepted steps back — a handful of hard-pushed
    # members no longer makes the whole fleet pay the backtracking
    # rollouts. Falls back to the full-batch fan when more members
    # reject (cold start) or when B ≤ compact. Member results are
    # computed by the same per-member arithmetic either way.
    # 64 (not 128): the compacted gather of the (M, ns, nu, nx) gain
    # tensor is one fused pad+gather on TPU, and at M=128 its scoped-vmem
    # stack allocation (17.3 MB) exceeds the 16 MB limit — a Mosaic-free
    # XLA fusion can still OOM vmem on gather shapes.
    line_search_compact: int = 64
    # Gain-equation solver for Quu (result-equivalent up to rounding):
    #   "schur":    recursive block-Schur SPD inverse — log-depth batched
    #               matmuls; on TPU the batched Cholesky lowering (a
    #               sequential column loop) measured ~70% of the whole
    #               backward sweep, Schur removes it
    #   "cholesky": jax.scipy cho_factor/cho_solve
    quu_solver: str = "schur"
    # Backward-pass execution (result-equivalent up to rounding):
    #   "sequential":  classic reverse lax.scan Riccati — ns dependent steps
    #   "associative": parallel Riccati via lax.associative_scan — ⌈log₂ ns⌉
    #                  stages of batched (nx×nx) algebra (PAPERS.md:9,
    #                  "The Parallelization of Riccati Recursion")
    # (a third mode, "pallas" — a fused hand-written kernel — was built,
    # measured 2× slower than XLA's fused lane-major path, and retired in
    # round 2; see solvers/msddp.py for the roofline rationale)
    riccati_mode: str = "sequential"
    # Lane-major backward tuning (result-equivalent up to f32 rounding):
    #   backward_unroll:   lax.scan unroll factor for the Riccati sweep —
    #                      trades instruction-stream length for fewer
    #                      per-node dispatch boundaries
    #   backward_contract: "split" evaluates the five GN quadratics and the
    #                      five chain contractions as separate lane-major
    #                      reduces; "combined" concatenates [Jx|Ju] and
    #                      [A|B] and evaluates ONE (nr,nz,B) Gram and ONE
    #                      (nx,nz,B) chain contraction per node (fewer,
    #                      larger VPU kernels; computes the symmetric Qxu
    #                      block redundantly, ~6% more FLOPs);
    #                      "blocksparse" additionally exploits the OCP's
    #                      declared dynamics sparsity (rows where A−I / B
    #                      are live — integrator chains make most A rows
    #                      exactly identity) and residual row sparsity via
    #                      static contiguous slices: ~2× fewer FLOPs per
    #                      sweep for SRBD (falls back to "split" when the
    #                      OCP declares no sparsity). Default: measured
    #                      8509 vs 5889 solve/s at B=1024 on v5e-lite
    #                      (tools/bench_backward_variants.py, round 2).
    backward_unroll: int = 1
    backward_contract: str = "blocksparse"
    # Two-node-fused Riccati chain (round-4 carry-chain experiment): scan
    # over ns/2 steps, each processing two adjacent nodes back-to-back —
    # halves the number of scan-carry round-trips for the (nx,nx,B) value
    # function (22 MB at B=4096) at identical total FLOPs. Targets the
    # value-carry serialization the round-3 roofline identified (backward
    # at 34% of its chained-VPU ceiling). Result-equivalent up to f32
    # rounding; requires even ns (falls back to the single-node scan
    # otherwise). MEASURED AND REJECTED on TPU v5e-lite (B=4096
    # heterogeneous fleet, tools/bench_opts.py: 15901 → 13812 solve/s,
    # −13%): the carry is not round-trip bound — XLA keeps it resident
    # across scan steps — and the doubled step body costs more in live
    # ranges/pipelining than the saved traffic. Kept as a validated
    # default-off knob with the BENCH_NOTES.md record.
    backward_pair_nodes: bool = False
    # Opt-in fast paths (both measured SLOWER than the XLA-AD defaults on
    # TPU v5e-lite at B=1024, tools/bench_linearize_variants.py:
    # analytic −10%, pruning −3% — the solver is fusion/memory-movement
    # bound, not FLOP bound; the closed-form assembly's scatter chains and
    # the pruning gathers both break XLA fusion. Kept as validated,
    # AD-exact alternatives for backends where FLOPs dominate):
    #   analytic_jacobians: use the OCP's closed-form stage_jacobians
    #   gram_row_pruning:   Gram products over residual_x/u_rows only
    analytic_jacobians: bool = False
    gram_row_pruning: bool = False
    # Sliced linearization (batched path + blocksparse backward only):
    # form ONLY the Jacobian rows the blocksparse backward reads — split
    # jacfwd per argument (x-rows wrt x, u-rows wrt u) emitting the sliced
    # stacks (Sx = (A−I)[live], Bs = B[live], Jxp/Jup = residual row
    # blocks) directly, instead of forming dense A/B/Jx/Ju and slicing in
    # the backward. For SRBD this roughly halves the Jacobian bytes
    # written by linearize and read back by the backward (6710 → 3512
    # floats/node) and skips the dead-row tangent arithmetic. Falls back
    # to the dense path when the OCP declares no sparsity. Results are
    # bit-identical to the dense path on CPU f64 and ≤1e-7 at f32 (each
    # one-hot jacfwd tangent runs the same arithmetic; the test suite
    # asserts solve-level equivalence), so it is safe as the default.
    # Measured on TPU v5e-lite, B=4096 heterogeneous fleet
    # (tools/bench_opts.py --noise 0.005): 9363 → 11986 solve/s (+28%)
    # at f32; also makes bf16 Jacobian formation obsolete (f32+sliced
    # 11986 > bf16+sliced 11344 — the formation is no longer the
    # bandwidth bottleneck once dead rows are never materialized).
    linearize_sliced: bool = True
    # With the sliced linearize: emit the Jacobian stacks LANE-MAJOR
    # (vmap out_axes=-1) so the backward scan consumes them without its
    # own transpose round-trip (scan xs must be materialized, so the
    # moveaxis copies are real HBM traffic). Measured a WASH on TPU
    # v5e-lite (B=4096 heterogeneous fleet: 11984 → 11999 solve/s,
    # +0.1% — XLA already fuses the layout change into the producer);
    # kept as a validated A/B knob, default off.
    linearize_lane_out: bool = False
    # Form the stage Jacobians INSIDE the backward scan (per node, per
    # lane) instead of materializing Sx/Bs/Jxp/Jup stacks in HBM between
    # the linearize and backward phases: the scan consumes only
    # (x, u, p, rho, d) per node (~200 floats/member vs ~3500) and each
    # node's Jacobian block lives only as scan-step temporaries. Same
    # one-hot-tangent arithmetic — equal to rounding (≤3e-16 on CPU f64;
    # XLA fuses the in-scan formation differently, tested). The
    # solver is HBM-bandwidth bound (~100 GB/s effective on v5e-lite,
    # calibrated from the linearize_sliced win), so trading a second
    # (in-scan) formation of the Jacobians for never writing/reading
    # them may pay. MEASURED AND REJECTED on TPU v5e-lite (B=4096
    # heterogeneous fleet: 11984 → 10465 solve/s, −13%): the bytes win
    # is real but the phase-separated linearize forms all 20 nodes'
    # Jacobians in one data-parallel vmap, while the in-scan formation
    # serializes that work into the 20-step sequential sweep — the
    # dependency chain lengthens by a full jacfwd per node, which costs
    # more than the saved HBM round-trip. Kept as a validated opt-in
    # (equal-to-rounding results) for backends where dispatch/bandwidth
    # ratios differ; requires the sliced gate (blocksparse + declared
    # rows) and f32 (bf16 formation excluded).
    linearize_fused_backward: bool = False
    # Linearization arithmetic ("f32" | "bf16"): with "bf16" the stage
    # Jacobians/residuals are FORMED in bfloat16 (inputs cast down, jacfwd
    # run under default matmul precision, outputs cast back) while ALL
    # Riccati/line-search algebra stays f32 — the VERDICT-r1 "bf16-safe
    # Jacobian formation with f32 Riccati" experiment. Jacobian entries
    # carry ~4e-3 relative error (8-bit mantissa), which Gauss-Newton
    # tolerates as an inexact-Newton perturbation (the merit/accept
    # decisions use exact f32 cost; residuals ρ and defects d are
    # recomputed exactly in f32, so gradients and the analytic defect
    # contraction stay exact — only the J·(·) curvature terms are
    # rounded). Warm-tick A/B on TPU v5e-lite at B=1024
    # (tools/bench_linearize_dtype.py): 8634 → 9204 solve/s (+6.6%),
    # same iteration count, max_defect still exactly 0. Default stays
    # "f32" (the golden-parity suite pins the exact-Jacobian fixed
    # point); bench.py selects "bf16" as the serving configuration,
    # backed by tests/test_linearize_precision.py walk-stability checks.
    linearize_precision: str = "f32"
    # AD mode for the sliced linearizer's Jacobian stacks:
    #   "fwd":   jacfwd everywhere (one JVP pass per INPUT column)
    #   "mixed": jacrev for stacks with fewer rows than columns — the
    #            dynamics x-stack is 22 live rows × 37 columns (22 VJP
    #            passes instead of 37 JVP passes), Bs 18×24, Jxp 34×37;
    #            Jup (42×24) stays jacfwd. Row/column counts come from
    #            the declared sparsity, so the choice is static.
    # Same Jacobian values either way (AD exactness — CPU f64 diff
    # ≤ 9e-16). MEASURED AND REJECTED on TPU v5e-lite (B=4096
    # heterogeneous fleet, tools/bench_opts.py --noise 0.005: 12009 →
    # 9902 solve/s, −18%): a VJP pass pays the primal trace plus
    # transposed accumulation where a JVP rides the primal, so the
    # 22-vs-37 pass-count win inverts. Kept as a validated opt-in.
    linearize_ad: str = "fwd"
    # Active-set compaction for the batched solve's iteration loop:
    # solve_batch's while_loop runs until the SLOWEST member converges,
    # so at warm steady state the last iterations drag every
    # already-converged member through linearize + backward + trial
    # (measured iters_mean 4.4 vs the 5-iteration wall-clock at B=4096;
    # 3.8 with shift_warmstart — ~25% of member-iterations masked idle).
    # With L = active_compact_levels > 0, each iteration first counts the
    # active members and, when they fit in B/2, B/4, …, B/2^L lanes,
    # gathers JUST the active members, runs the identical iteration on
    # the compacted sub-batch, and scatters the results back (the
    # gather/scatter is ~1 ms of HBM traffic vs ~40 ms of iteration
    # compute at B=4096). Per-member arithmetic is lane-position
    # independent, so results match the full-batch path to rounding
    # (≈1e-15 rel on f64 — the nested lax.cond dispatch changes XLA
    # codegen, so NOT bit-identical; iteration counts and convergence
    # flags match exactly —
    # tests/test_batched_solver.py::TestActiveCompaction). Compile cost:
    # one extra copy of the iteration body per level (measured
    # negligible). Default 4 — measured on TPU v5e-lite (B=4096
    # heterogeneous fleet, tools/bench_opts.py --noise 0.005):
    # 12003 → 15227 solve/s at levels=2, 15376 at 3, 15890 at 4 (+
    # shift_warmstart), 16038 at 5 (diminishing); levels where B/2^l
    # would drop below 32 lanes are skipped automatically.
    active_compact_levels: int = 4
    # Forward-rollout scan unroll: the nonlinear rollout is a 20-step
    # sequential scan of tiny per-step work (~5 MFLOP at B=1024), i.e.
    # dispatch-latency-bound — unrolling shortens the dependency chain
    # bookkeeping rather than the math
    rollout_unroll: int = 1
    # Lane-major fast-path line search (batched path only): evaluate the
    # α₀ trial's rollout AND cost sweep with the batch on the minor (lane)
    # axis — the same layout transform that took the backward sweep from
    # 208 ms to 39 ms at B=4096. MEASURED A WASH on TPU v5e-lite (B=4096
    # heterogeneous fleet, tools/bench_opts.py --noise 0.005: 11979 →
    # 11826 solve/s, −1.3%): unlike the backward (whose operands already
    # live lane-major inside one scan), the trial must transpose the gain
    # tensors in (Ks alone is ~290 MB at B=4096) and the results back
    # out, and XLA's batching of the per-step dynamics dots re-transposes
    # intermediates — the occupancy win is spent on layout traffic. Kept
    # as a validated opt-in (results equal to f32 rounding, CPU-tested);
    # default off.
    rollout_lane_major: bool = False
    # Forward-pass execution:
    #   "nonlinear": true MS-DDP rollout (sequential in the horizon)
    #   "linear":    affine δx recursion via associative scan (SQP-flavored
    #                Gauss-Newton step; defects re-measured exactly) — no
    #                sequential dependence on the horizon at all
    forward_pass: str = "nonlinear"
    # Multiple-shooting merit: line search decides on φ = J + ν·Σ‖defect‖²
    # (the defect term contracts exactly by (1−α)² per step, so it is
    # predicted analytically). ν plays the exact-penalty-multiplier role for
    # the shooting-gap equality constraints; the reference's pyddp tracks a
    # "defect contraction rate" for the same purpose (README.md:6).
    defect_weight: float = 1e5


DEFAULT_CONFIG = SRBDConfig()
DEFAULT_DDP_OPTIONS = DDPOptions()


def tuple3(x) -> Tuple[float, float, float]:
    return (float(x[0]), float(x[1]), float(x[2]))
