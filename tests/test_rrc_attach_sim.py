"""Full RRC+NAS attach over the PHY (PRACH -> RAR -> RRC/NAS -> bearer)."""

from lteax.apps.rrc_attach_sim import run


def test_rrc_attach_over_phy():
    res = run(verbose=False)
    assert res == {"rach": True, "as_security": True, "attach": True,
                   "user_plane": True}
