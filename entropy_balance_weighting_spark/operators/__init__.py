"""Relational operators of the engine (SURVEY §2 inventory).

Each module implements one family of operators as pure DataFrame → DataFrame
functions, declaratively (Catalyst optimizes them); the solver layer and the
SQL-checkable query registry both build on these.
"""
