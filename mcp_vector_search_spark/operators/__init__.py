"""Relational + search operators, each a DataFrame→DataFrame transform.

Every operator keeps the plan declarative (Catalyst decides physical
strategy) and documents its 100 TB behavior: what shuffles, what
broadcasts, what prunes.
"""
