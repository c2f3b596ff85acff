"""Evaluation harness."""

from .evaluation_module import EvaluationModule, run_evaluation

__all__ = ["EvaluationModule", "run_evaluation"]
