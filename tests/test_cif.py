"""CIF corpus tooling tests (reference misc_py/download_cifs*.py,
copy_no_H.py)."""

import os

from emx.data.cif import (
    contains_hydrogen,
    element_symbol,
    fetch_cifs,
    filter_no_h,
    parse_cif,
    stage_felix_jobs,
)

CIF_NO_H = """data_quartz
_chemical_formula_sum 'Si O2'
_cell_length_a 4.913
loop_
_atom_site_label
_atom_site_type_symbol
_atom_site_fract_x
Si1 Si4+ 0.470
O1 O2- 0.413
"""

CIF_WITH_H = """data_ice
_chemical_formula_sum 'H2 O'
loop_
_atom_site_label
_atom_site_type_symbol
_atom_site_fract_x
O1 O 0.0
H1 H 0.1
H2 D 0.2
"""


def test_element_symbol_strips_ions():
    assert element_symbol("O2-") == "O"
    assert element_symbol("Fe3+") == "Fe"
    assert element_symbol("Ca1") == "Ca"
    assert element_symbol("D") == "D"
    assert element_symbol("Si4+") == "Si"


def test_parse_and_hydrogen_detection():
    c1 = parse_cif(CIF_NO_H)
    assert c1["tags"]["_cell_length_a"] == "4.913"
    assert not contains_hydrogen(c1)
    c2 = parse_cif(CIF_WITH_H)
    assert contains_hydrogen(c2)


def test_filter_no_h(tmp_path):
    a = tmp_path / "a.cif"
    b = tmp_path / "b.cif"
    a.write_text(CIF_NO_H)
    b.write_text(CIF_WITH_H)
    keep = filter_no_h([str(a), str(b)])
    assert keep == [str(a)]


def test_fetch_cifs_with_fake_opener(tmp_path):
    sel = tmp_path / "sel.txt"
    sel.write_text("cod://1\ncod://2\ncod://3\n")
    blobs = {"cod://1": CIF_NO_H, "cod://2": CIF_WITH_H,
             "cod://3": CIF_NO_H}
    n = fetch_cifs(str(sel), str(tmp_path / "out"), n=10,
                   opener=lambda u: blobs[u].encode(), no_h_only=True,
                   seed=0)
    assert n == 2  # the hydrogen one filtered out
    assert sorted(os.listdir(tmp_path / "out")) == ["0.cif", "1.cif"]


def test_stage_felix_jobs(tmp_path):
    cif = tmp_path / "x.cif"
    cif.write_text(CIF_NO_H)
    tpl = tmp_path / "tpl0"
    tpl.mkdir()
    (tpl / "felix.inp").write_text("inp")
    (tpl / "felix.hkl").write_text("hkl")
    n = stage_felix_jobs([str(cif)], [str(tpl)], str(tmp_path / "jobs"), 3)
    assert n == 3
    for i in range(3):
        d = tmp_path / "jobs" / str(i)
        assert (d / "felix.cif").exists()
        assert (d / "felix.inp").read_text() == "inp"
        assert (d / "felix.hkl").read_text() == "hkl"


def test_element_symbol_hydrogen_site_labels():
    """'HO1'/'HF2' are hydrogen site labels (H bound to O1/F2), not
    Ho/Hf — the 2-letter reading requires a lowercase second letter
    (ADVICE r2)."""
    assert element_symbol("HO1") == "H"
    assert element_symbol("HF2") == "H"
    assert element_symbol("Ho1") == "Ho"
    assert element_symbol("Hf2") == "Hf"
