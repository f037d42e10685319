"""Operator library: each module re-answers a class of reference tools
(SURVEY.md section 2.1) with idiomatic Spark primitives."""
