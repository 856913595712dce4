"""LTE FDD PHY dataplane: config, tables, sequences, OFDM, sync, FEC, channels."""

from lteax.phy.config import PhyConfig  # noqa: F401
