"""DataFrame operators reproducing the reference's algorithm surface."""
