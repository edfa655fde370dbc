"""CLI end-to-end tests (mirrors reference tests/test_cli.py shape: the
test/scout commands run against the synthetic employees web; scrape is
exercised via the engine conformance suite)."""

import json

from spatula_ray.cli import get_page_classes, main


def test_get_page_classes_single():
    cls = get_page_classes("spatula_ray.web.EmployeeList")
    assert cls[0].__name__ == "EmployeeList"


def test_get_page_classes_module_discovery():
    classes = get_page_classes("spatula_ray.web")
    names = [c.__name__ for c in classes]
    assert "DocList" in names and "EmployeeList" in names
    assert names == sorted(names)  # alphabetical member order


def test_cli_test_command(capsys):
    rc = main(["test", "spatula_ray.web.EmployeeList",
               "--resolver", "spatula_ray.web:EmployeesResolverFactory"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "would continue with EmployeeDetail" in out
    assert "paginating for EmployeeList" in out
    # 44 non-vacant rows across 3 listing pages
    assert "44 items" in out


def test_cli_test_no_pagination(capsys):
    rc = main(["test", "spatula_ray.web.EmployeeList", "--no-pagination",
               "--resolver", "spatula_ray.web:EmployeesResolverFactory"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "paginating" not in out
    assert "14 items" in out  # first page only, minus the vacant row


def test_cli_scout_command(tmp_path, capsys):
    out_file = str(tmp_path / "scout.json")
    rc = main(["scout", "spatula_ray.web.EmployeeList", "-o", out_file,
               "--resolver", "spatula_ray.web:EmployeesResolverFactory"])
    assert rc == 0
    items = json.load(open(out_file))
    assert len(items) == 44
    assert items[0]["__next__"].startswith("EmployeeDetail")
    assert set(items[0]["data"]) == {"first", "last", "url"}
