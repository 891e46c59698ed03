"""Solver layer: driver loops over kernel reductions + K×K driver algebra."""
