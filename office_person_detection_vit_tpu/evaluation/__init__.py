"""Evaluation harness."""

from .evaluation_module import EvaluationModule, run_evaluation
from .transform_evaluator import TransformEvaluator

__all__ = ["EvaluationModule", "TransformEvaluator", "run_evaluation"]
