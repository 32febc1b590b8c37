"""Operator library — reusable DataFrame transforms.

Each module hosts one operator family from SURVEY.md §2, expressed as
composable functions over DataFrames/Columns.  The contract package wires
them to the driver's query/oracle registry.
"""
