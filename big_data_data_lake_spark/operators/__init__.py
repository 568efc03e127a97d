"""Operator library — SURVEY §2's inventory as composable DataFrame
transforms. Every function takes/returns DataFrames or Columns so
Catalyst sees one logical plan end-to-end (filters push down through
these into the scan; no materialization boundaries).
"""
