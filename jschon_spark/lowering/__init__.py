"""Lowerings of the compiled constraint DAG onto Spark execution.

``columns``  — pure ``pyspark.sql.Column`` expressions against typed
               rows (the 10^12-row scale path; whole-stage codegen).
``batch``    — vectorized Arrow batch evaluator over dynamic JSON
               strings (full 2020-12 coverage; the sanctioned fallback).
"""
