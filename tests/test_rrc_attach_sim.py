"""Full RRC+NAS attach + intra-LTE handover over the PHY
(PRACH -> RAR -> RRC/NAS -> bearer -> measConfig -> report -> HO command ->
dedicated RACH + re-keyed complete on the target cell)."""

from lteax.apps.rrc_attach_sim import run
import pytest


@pytest.mark.heavy
def test_rrc_attach_over_phy():
    res = run(verbose=False)
    assert res == {"rach": True, "as_security": True, "attach": True,
                   "user_plane": True, "handover": True}
