from .operators import LinearOp, DenseOp, BlockSparseOp, EllOp, materialize
