#!/usr/bin/env python
"""Profiling entry point (SURVEY §5.1; replaces the reference's ad-hoc
timing meters with product tooling).

Product profiling:
    tools/train.py --profile N      trace the first N train steps
    tools/test.py  --profile N      trace the first N eval batches
(traces land in the run's output dir; open with TensorBoard's profile
plugin or xprof.)

Developer microbenchmarks (this dispatcher):
    python tools/profile.py eval-phases [cap] [batch]
        per-phase eval-step decomposition (voxelize / backbone_3d / BEV /
        head / NMS) via truncated-topology variants
    python tools/profile.py trace [cap] [out_dir]
        raw jax.profiler trace of the SECOND backbone forward
    python tools/profile.py rulebook
        subm-rulebook construction cost decomposition (in-jit repetition)
    python tools/profile.py downsample
        sort-based vs dense-table strided-conv rulebooks
    python tools/profile.py gather
        XLA gather cost vs table size / row width / locality
    python tools/profile.py backbone
        per-stage rulebook + gather-GEMM costs at KITTI shapes
    python tools/profile.py pvrcnn
        PV-RCNN module-level timings (VSA, roi head)

Timing discipline on the tunneled axon chip: the dispatch floor is ~29 ms
and dispatches do NOT overlap, so all microbenchmarks either repeat the op
inside one jit (lax.scan, K=8) or report whole-dispatch costs.
"""

import runpy
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent

COMMANDS = {
    'eval-phases': 'profile_eval_phases',
    'trace': 'profile_trace_backbone',
    'rulebook': 'profile_rulebook_parts',
    'downsample': 'profile_downsample',
    'gather': 'profile_gather_cost',
    'backbone': 'profile_backbone2',
    'pvrcnn': 'profile_pvrcnn',
}


def main():
    if len(sys.argv) < 2 or sys.argv[1] not in COMMANDS:
        print(__doc__)
        sys.exit(0 if len(sys.argv) < 2 else 1)
    mod = COMMANDS[sys.argv[1]]
    sys.argv = [str(HERE / f'{mod}.py')] + sys.argv[2:]
    runpy.run_path(str(HERE / f'{mod}.py'), run_name='__main__')


if __name__ == '__main__':
    main()
