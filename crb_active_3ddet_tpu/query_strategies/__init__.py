"""Query-strategy factory.

Parity: ``pcdet/query_strategies/__init__.py:12-29`` — same names, same
``build_strategy`` signature (model → (model, variables) pair since our
detectors are functional).
"""

from __future__ import annotations

from .random_sampling import RandomSampling
from .confidence_sampling import ConfidenceSampling
from .entropy_sampling import EntropySampling
from .montecarlo_sampling import MonteCarloSampling
from .coreset_sampling import CoresetSampling
from .llal_sampling import LLALSampling
from .badge_sampling import BadgeSampling
from .bald_sampling import BALDSampling
from .crb_sampling import CRBSampling

__factory = {
    'random': RandomSampling,
    'entropy': EntropySampling,
    'badge': BadgeSampling,
    'bald': BALDSampling,
    'coreset': CoresetSampling,
    'llal': LLALSampling,
    'montecarlo': MonteCarloSampling,
    'confidence': ConfidenceSampling,
    'crb': CRBSampling,
}


def names():
    return sorted(__factory.keys())


def build_strategy(method, model, variables, labelled_loader,
                   unlabelled_loader, rank, active_label_dir, cfg):
    if method not in __factory:
        raise KeyError('Unknown query strategy:', method)
    return __factory[method](model, variables, labelled_loader,
                             unlabelled_loader, rank, active_label_dir, cfg)
