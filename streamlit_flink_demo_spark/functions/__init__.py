"""Column-function helpers shared by plans and operators."""
