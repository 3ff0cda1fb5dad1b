from athenapk_tpu.config.parameter_input import ParameterInput

DECK = """
<comment>
problem = test

<job>
problem_id = sod

<parthenon/mesh>
nx1 = 64    # with comment
x1min = 0.0
x1max = 1.0
ix2_bc = outflow
ix2_bc = periodic

<hydro>
fluid = euler
gamma = 1.4
"""


def test_parse_basic():
    pin = ParameterInput.from_string(DECK)
    assert pin.get_string("job", "problem_id") == "sod"
    assert pin.get_integer("parthenon/mesh", "nx1") == 64
    assert pin.get_real("hydro", "gamma") == 1.4
    # later duplicate wins
    assert pin.get_string("parthenon/mesh", "ix2_bc") == "periodic"


def test_overrides():
    pin = ParameterInput.from_string(
        DECK, overrides=["parthenon/mesh/nx1=128", "hydro/riemann=hlle"])
    assert pin.get_integer("parthenon/mesh", "nx1") == 128
    assert pin.get_string("hydro", "riemann") == "hlle"


def test_get_or_add_records_back():
    pin = ParameterInput.from_string(DECK)
    assert pin.get_or_add_real("hydro", "cfl_x", 0.3) == 0.3
    assert pin.get_real("hydro", "cfl_x") == 0.3


def test_reference_decks_parse():
    import glob
    decks = glob.glob("/root/reference/inputs/*.in")
    assert decks
    for d in decks:
        pin = ParameterInput.from_file(d)
        assert pin.get_string("job", "problem_id")
