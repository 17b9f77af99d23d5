#!/usr/bin/env python
"""Profiling entry point (SURVEY §5.1; replaces the reference's ad-hoc
timing meters with product tooling).

The repo has exactly three profiling surfaces:
  1. product tracing:  tools/train.py --profile N  /  tools/test.py --profile N
     (jax.profiler traces of the first N steps, written to the run's output
     dir; open with TensorBoard's profile plugin or xprof)
  2. this dispatcher:  python tools/profile.py <cmd> [...]
  3. trace summaries:  python tools/trace_report.py <trace_dir> [top] [iters]

Dispatcher commands (modules live in tools/profiling/):
    eval-phases [cap] [batch]   per-phase eval-step decomposition (voxelize /
                                backbone_3d / BEV / head / NMS) via
                                truncated-topology variants
    trace-eval  [out] [batch]   jax.profiler trace of the FULL eval step at
                                the bench.py workload (batch 8, prod caps)
    trace-crb   [out]           trace CRB stage-1 score fn + stage-2 grad fn
    rulebook                    subm-rulebook construction cost decomposition
    gather                      XLA gather cost vs table size / row width
    backbone                    per-stage rulebook + gather-GEMM costs at
                                KITTI shapes
    pvrcnn                      PV-RCNN module-level timings (VSA, roi head)
    stage1-host [pool] [batch]  CRB stage-1 host vs device wall-clock split
    mesh-scaling [batch]        per-device FLOPs of the sharded CRB scorer
                                at mesh sizes 1/2/4/8 (CPU mesh)

Timing discipline on the tunneled axon chip: the dispatch floor is ~29 ms
and dispatches do NOT overlap, so all microbenchmarks either repeat the op
inside one jit (lax.scan, K=8) or report whole-dispatch costs.

Historical microbenchmarks whose findings landed (sort-join rulebooks,
payload-carrying downsample sorts, scalar-vs-row gather costs) were deleted
once their conclusions were recorded in STATUS.md; see git history
(profile_rulebook_variants.py, profile_downsample.py).
"""

import runpy
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent

COMMANDS = {
    'eval-phases': 'eval_phases',
    'trace-eval': 'trace_eval',
    'trace-crb': 'trace_crb',
    'rulebook': 'rulebook_parts',
    'gather': 'gather_cost',
    'backbone': 'backbone',
    'pvrcnn': 'pvrcnn',
    'stage1-host': 'stage1_host',
    'mesh-scaling': 'mesh_scaling',
}


def main():
    if len(sys.argv) < 2 or sys.argv[1] not in COMMANDS:
        print(__doc__)
        sys.exit(0 if len(sys.argv) < 2 else 1)
    mod = HERE / 'profiling' / f'{COMMANDS[sys.argv[1]]}.py'
    sys.argv = [str(mod)] + sys.argv[2:]
    runpy.run_path(str(mod), run_name='__main__')


if __name__ == '__main__':
    main()
