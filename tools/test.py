"""Evaluation CLI.

Parity: ``tools/test.py`` of the reference — single-ckpt eval or
``--eval_all`` watch-dir loop (:95-154) with an eval-record file so restarts
skip finished epochs.
"""

from __future__ import annotations

import argparse
import datetime
import glob
import re
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

import jax  # noqa: E402

from crb_active_3ddet_tpu.config import cfg, cfg_from_list, load_config  # noqa: E402
from crb_active_3ddet_tpu.datasets import build_dataloader  # noqa: E402
from crb_active_3ddet_tpu.models import build_network  # noqa: E402
from crb_active_3ddet_tpu.runtime import checkpoint as ckpt_rt  # noqa: E402
from crb_active_3ddet_tpu.runtime import eval as eval_rt  # noqa: E402
from crb_active_3ddet_tpu.runtime import train as train_rt  # noqa: E402
from crb_active_3ddet_tpu.runtime.optimization import build_optimizer  # noqa: E402
from crb_active_3ddet_tpu.utils import common as common_utils  # noqa: E402


def parse_config():
    parser = argparse.ArgumentParser(description='arg parser')
    parser.add_argument('--cfg_file', type=str, required=True)
    parser.add_argument('--batch_size', type=int, default=None)
    parser.add_argument('--workers', type=int, default=0)
    parser.add_argument('--extra_tag', type=str, default='default')
    parser.add_argument('--ckpt', type=str, default=None)
    parser.add_argument('--eval_all', action='store_true', default=False)
    parser.add_argument('--ckpt_dir', type=str, default=None)
    parser.add_argument('--max_waiting_mins', type=float, default=30)
    parser.add_argument('--wandb', action='store_true', default=False,
                        help='also log eval metrics to wandb')
    parser.add_argument('--profile', type=int, default=0,
                        help='trace the first N eval batches with '
                             'jax.profiler into <eval_dir>/profile')
    parser.add_argument('--coordinator', type=str, default=None,
                        help='multi-host coordinator ip:port')
    parser.add_argument('--num_processes', type=int, default=None)
    parser.add_argument('--process_id', type=int, default=None)
    parser.add_argument('--set', dest='set_cfgs', default=None,
                        nargs=argparse.REMAINDER)
    args = parser.parse_args()
    load_config(args.cfg_file, cfg)
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


def eval_ckpt(ckpt_path, model, state_template, eval_step, test_set,
              test_loader, logger, result_dir=None, profiler=None):
    # build variables straight from the checkpoint pytree — no training-path
    # init/compile needed for evaluation
    import jax.numpy as jnp
    import jax
    ck = ckpt_rt.load_checkpoint(ckpt_path)
    variables = {'params': jax.tree.map(jnp.asarray, ck['model_state']),
                 'batch_stats': jax.tree.map(jnp.asarray, ck['batch_stats'])}
    ap_str, ap_dict, recall = eval_rt.eval_one_epoch(
        variables, eval_step, test_set, test_loader, cfg.CLASS_NAMES,
        logger=logger, result_dir=result_dir, profiler=profiler)
    logger.info('\n%s', ap_str)
    logger.info('Result: %s', {k: round(float(v), 4) for k, v in ap_dict.items()})
    return ap_dict


def main():
    args, _ = parse_config()
    from crb_active_3ddet_tpu.parallel import init_distributed
    init_distributed(args.coordinator, args.num_processes, args.process_id)
    common_utils.set_random_seed(1024)
    batch_size = args.batch_size or cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU
    output_dir = REPO_ROOT / 'output' / cfg.EXP_GROUP_PATH / cfg.TAG / args.extra_tag
    eval_dir = output_dir / 'eval'
    eval_dir.mkdir(parents=True, exist_ok=True)
    log_file = eval_dir / ('log_eval_%s.txt'
                           % datetime.datetime.now().strftime('%Y%m%d-%H%M%S'))
    logger = common_utils.create_logger(log_file, rank=0)
    common_utils.enable_compilation_cache()
    logger.info('jax devices: %s', jax.devices())

    from crb_active_3ddet_tpu.utils.observability import MetricsLogger
    tb_log = MetricsLogger(log_dir=eval_dir / 'tensorboard',
                           use_wandb=args.wandb,
                           run_name=f'eval_{cfg.TAG}_{args.extra_tag}',
                           config=cfg)

    test_set, test_loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size,
        workers=args.workers, logger=logger, training=False)
    model = build_network(model_cfg=cfg.MODEL,
                          num_class=len(cfg.CLASS_NAMES), dataset=test_set)
    state_template = None
    eval_step = eval_rt.make_eval_step(model, test_set,
                                       cfg.MODEL.POST_PROCESSING,
                                       num_class=len(cfg.CLASS_NAMES))

    profiler = None
    if args.profile > 0:
        from crb_active_3ddet_tpu.runtime.train import ProfilerHook
        profiler = ProfilerHook(args.profile, eval_dir / 'profile')
        logger.info('profiling first %d eval batches -> %s', args.profile,
                    eval_dir / 'profile')

    if not args.eval_all:
        assert args.ckpt is not None, '--ckpt required without --eval_all'
        ap = eval_ckpt(args.ckpt, model, state_template, eval_step, test_set,
                       test_loader, logger, eval_dir, profiler=profiler)
        tb_log.add_scalars(ap, step=0, prefix='eval/')
        tb_log.close()
        return

    ckpt_dir = Path(args.ckpt_dir) if args.ckpt_dir else output_dir / 'ckpt'
    record_file = eval_dir / 'eval_list_val.txt'
    evaluated = set()
    if record_file.exists():
        evaluated = set(record_file.read_text().split())
    wait_start = time.time()
    while True:
        ckpts = sorted(glob.glob(str(ckpt_dir / 'checkpoint_epoch_*.pkl')),
                       key=lambda p: int(re.search(r'epoch_(\d+)', p).group(1)))
        todo = [c for c in ckpts if c not in evaluated]
        if not todo:
            if time.time() - wait_start > args.max_waiting_mins * 60:
                break
            time.sleep(30)
            continue
        wait_start = time.time()
        for c in todo:
            epoch = int(re.search(r'epoch_(\d+)', c).group(1))
            logger.info('==> evaluating %s', c)
            ap = eval_ckpt(c, model, state_template, eval_step, test_set,
                           test_loader, logger, eval_dir)
            tb_log.add_scalars(ap, step=epoch, prefix='eval/')
            tb_log.flush()
            evaluated.add(c)
            with open(record_file, 'a') as f:
                print(c, file=f)


if __name__ == '__main__':
    main()
