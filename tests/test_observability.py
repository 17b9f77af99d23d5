"""Observability wiring: MetricsLogger writes tensorboard event files and
the AL selection dashboard routes through it (VERDICT r1 weak-spot 8)."""

import glob
import os

from crb_active_3ddet_tpu.utils.observability import MetricsLogger


def test_metrics_logger_writes_events(tmp_path):
    log = MetricsLogger(log_dir=tmp_path / 'tb')
    log.add_scalar('train/loss', 1.25, 0)
    log.add_scalar('train/loss', 0.75, 1)
    log.add_scalars({'Car_3d/moderate_R40': 79.0, 'notanumber': 'x'},
                    step=2, prefix='eval/')
    log.flush()
    log.close()
    events = glob.glob(str(tmp_path / 'tb' / 'events.out.tfevents.*'))
    assert events, 'no tensorboard event file written'
    assert os.path.getsize(events[0]) > 0


def test_update_dashboard_routes_to_metrics(tmp_path):
    class FakeStrategy:
        pass
    from crb_active_3ddet_tpu.query_strategies.strategy import Strategy
    strat = FakeStrategy()
    strat.point_measures = ['mean', 'median', 'variance']
    strat.selected_bbox = [{'Car': 3, 'Pedestrian': 1},
                           {'Car': 2, 'Pedestrian': 0}]
    for met in strat.point_measures:
        setattr(strat, f'selected_{met}_points',
                [{'Car': 10.0, 'Pedestrian': 5.0},
                 {'Car': 8.0, 'Pedestrian': 0.0}])

    seen = {}

    class FakeMetrics:
        def add_scalar(self, key, value, step=None):
            seen[key] = value
    Strategy.update_dashboard(strat, cur_epoch=0, accumulated_iter=7,
                              metrics=FakeMetrics())
    assert seen['active_selection/num_bbox_Car'] == 5
    assert seen['active_selection/total_bbox_selected'] == 6
    assert 'active_selection/mean_points_Car' in seen


def test_profiler_hook(tmp_path):
    """--profile machinery: traces the first N steps then stops."""
    import jax.numpy as jnp
    from crb_active_3ddet_tpu.runtime.train import ProfilerHook
    h = ProfilerHook(2, tmp_path / 'prof')
    import jax
    f = jax.jit(lambda x: x * 2)
    for _ in range(4):
        h.step_start()
        jax.block_until_ready(f(jnp.ones((8, 8))))
        h.step_end()
    h.close()
    assert not h._active
    files = list((tmp_path / 'prof').rglob('*'))
    assert files, 'no trace output written'
