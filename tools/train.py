"""Training CLI.

Parity: ``tools/train.py`` of the reference (arg surface :32-68, cfg merge,
active/standard trainer selection :139-162,222-224, seed 666 :91, ckpt
autoresume :181-191).  TPU deltas: no DDP/launcher flags — multi-chip runs
via ``jax.distributed`` + mesh sharding (--mesh), one process per host.
"""

from __future__ import annotations

import argparse
import datetime
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

import jax  # noqa: E402

from crb_active_3ddet_tpu.config import (cfg, cfg_from_list, load_config,  # noqa: E402
                                         log_config_to_file)
from crb_active_3ddet_tpu.datasets import build_dataloader, build_active_dataloader  # noqa: E402
from crb_active_3ddet_tpu.models import build_network  # noqa: E402
from crb_active_3ddet_tpu.runtime import checkpoint as ckpt_rt  # noqa: E402
from crb_active_3ddet_tpu.runtime import train as train_rt  # noqa: E402
from crb_active_3ddet_tpu.runtime.optimization import build_optimizer  # noqa: E402
from crb_active_3ddet_tpu.utils import common as common_utils  # noqa: E402


def parse_config():
    parser = argparse.ArgumentParser(description='arg parser')
    parser.add_argument('--cfg_file', type=str, required=True)
    parser.add_argument('--batch_size', type=int, default=None)
    parser.add_argument('--epochs', type=int, default=None)
    parser.add_argument('--workers', type=int, default=0)
    parser.add_argument('--extra_tag', type=str, default='default')
    parser.add_argument('--ckpt', type=str, default=None)
    parser.add_argument('--fix_random_seed', action='store_true', default=True)
    parser.add_argument('--ckpt_save_interval', type=int, default=1)
    parser.add_argument('--max_ckpt_save_num', type=int, default=30)
    parser.add_argument('--wandb', action='store_true', default=False,
                        help='also log to wandb (WANDB_PROJECT env)')
    parser.add_argument('--mesh', type=str, default='auto',
                        help="data-parallel mesh: 'auto' (all chips when the "
                             "batch divides evenly), 'none', or a device count")
    parser.add_argument('--profile', type=int, default=0,
                        help='trace the first N train steps with '
                             'jax.profiler into <output>/profile')
    parser.add_argument('--coordinator', type=str, default=None,
                        help='multi-host: coordinator ip:port '
                             '(parity common_utils.init_dist_slurm; SLURM '
                             'env is auto-detected without this flag)')
    parser.add_argument('--num_processes', type=int, default=None)
    parser.add_argument('--process_id', type=int, default=None)
    parser.add_argument('--set', dest='set_cfgs', default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    load_config(args.cfg_file, cfg)
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


def _resolve_mesh(mesh_arg, batch_size, logger):
    """'auto' → all chips when batch divides evenly; 'none' → single device;
    an int → first N devices (batch must divide)."""
    from crb_active_3ddet_tpu.parallel import default_mesh, make_mesh
    if mesh_arg == 'none':
        return None
    if mesh_arg == 'auto':
        mesh = default_mesh(batch_size)
        if mesh is not None:
            logger.info('DP mesh over %d devices (batch %d)',
                        mesh.size, batch_size)
        return mesh
    n = int(mesh_arg)
    if n <= 1:
        return None
    if batch_size % n:
        raise ValueError(f'batch_size {batch_size} not divisible by '
                         f'mesh size {n}')
    mesh = make_mesh(jax.devices()[:n])
    logger.info('DP mesh over %d devices (batch %d)', n, batch_size)
    return mesh


def main():
    args, cfg_local = parse_config()
    from crb_active_3ddet_tpu.parallel import init_distributed
    world, rank = init_distributed(args.coordinator, args.num_processes,
                                   args.process_id)
    batch_size = args.batch_size or cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU
    epochs = args.epochs or cfg.OPTIMIZATION.NUM_EPOCHS

    output_dir = REPO_ROOT / 'output' / cfg.EXP_GROUP_PATH / cfg.TAG / args.extra_tag
    ckpt_dir = output_dir / 'ckpt'
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    log_file = output_dir / ('log_train_%s.txt'
                             % datetime.datetime.now().strftime('%Y%m%d-%H%M%S'))
    logger = common_utils.create_logger(log_file, rank=0)
    logger.info('**********************Start logging**********************')
    common_utils.enable_compilation_cache()
    logger.info('jax devices: %s', jax.devices())
    log_config_to_file(cfg, logger=logger)

    if args.fix_random_seed:
        common_utils.set_random_seed(666)

    mesh = _resolve_mesh(args.mesh, batch_size, logger)

    from crb_active_3ddet_tpu.utils.observability import MetricsLogger
    tb_log = MetricsLogger(log_dir=output_dir / 'tensorboard',
                           use_wandb=args.wandb,
                           run_name=f'{cfg.TAG}_{args.extra_tag}', config=cfg)

    if cfg.get('ACTIVE_TRAIN', None):
        from crb_active_3ddet_tpu.runtime.active import train_model_active
        train_model_active(cfg, args, batch_size, logger, output_dir, ckpt_dir,
                           workers=args.workers, mesh=mesh, tb_log=tb_log)
        tb_log.close()
        logger.info('**********************End active training**********************')
        return

    if cfg.get('SELF_TRAIN', None):
        # ST3D self-training (parity: tools/train.py:222-224 cfg.SELF_TRAIN)
        from crb_active_3ddet_tpu.runtime.self_training import train_model_st
        train_model_st(cfg, args, batch_size, logger, output_dir, ckpt_dir,
                       workers=args.workers, tb_log=tb_log)
        tb_log.close()
        logger.info('**********************End self-training**********************')
        return

    train_set, train_loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size,
        workers=args.workers, logger=logger, training=True, seed=666)

    model = build_network(model_cfg=cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset=train_set)
    steps_per_epoch = max(len(train_loader), 1)
    optimizer, lr_sched = build_optimizer(cfg.OPTIMIZATION,
                                          total_steps=steps_per_epoch * epochs)
    state = train_rt.init_train_state(model, optimizer, train_set, batch_size)

    start_epoch = 0
    latest, last_epoch = ckpt_rt.find_latest_checkpoint(ckpt_dir)
    if args.ckpt is not None:
        state = ckpt_rt.restore_train_state(state, ckpt_rt.load_checkpoint(args.ckpt))
        logger.info('Restored from %s', args.ckpt)
    elif latest is not None:
        state = ckpt_rt.restore_train_state(state, ckpt_rt.load_checkpoint(latest))
        start_epoch = last_epoch
        logger.info('Auto-resumed from %s (epoch %d)', latest, last_epoch)

    train_step = train_rt.make_train_step(model, optimizer, train_set,
                                          mesh=mesh)
    if mesh is not None:
        from crb_active_3ddet_tpu.parallel import place_replicated
        state = place_replicated(state, mesh)
    rng = jax.random.PRNGKey(666)
    profiler = None
    if args.profile > 0:
        profiler = train_rt.ProfilerHook(args.profile,
                                         output_dir / 'profile')
        logger.info('profiling first %d steps -> %s', args.profile,
                    output_dir / 'profile')
    logger.info('*************** Start training (%d epochs, %d steps/epoch) ***************',
                epochs, steps_per_epoch)
    for epoch in range(start_epoch, epochs):
        state, metrics, rng = train_rt.train_one_epoch(
            state, train_step, train_loader, rng, logger=logger,
            cur_epoch=epoch, tb_log=tb_log, profiler=profiler)
        logger.info('epoch %d done: loss %.4f (data %.1fs batch %.1fs)',
                    epoch, metrics['loss'], metrics['data_time'],
                    metrics['batch_time'])
        tb_log.add_scalar('train/epoch_loss', metrics['loss'], epoch)
        if (epoch + 1) % args.ckpt_save_interval == 0 or epoch + 1 == epochs:
            ck = ckpt_rt.checkpoint_state(state, epoch=epoch + 1,
                                          it=int(state.step))
            fn = ckpt_rt.save_checkpoint(
                ck, str(ckpt_dir / f'checkpoint_epoch_{epoch + 1}'))
            logger.info('Saved %s', fn)
    tb_log.close()
    logger.info('**********************End training**********************')


if __name__ == '__main__':
    main()
