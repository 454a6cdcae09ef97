"""Stub: hdf5plugin only registers HDF5 compression filters used by the
reference's released datasets; the synthetic files here are uncompressed."""
