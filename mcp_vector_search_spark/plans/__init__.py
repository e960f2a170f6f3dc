"""End-to-end query pipelines composed from the operator library.

Mirrors the reference's hard-coded Python control flow
(``core/search.py:215-432``) as declarative DataFrame plans that
Catalyst optimizes as a whole.
"""
