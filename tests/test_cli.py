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


def test_cli_test_interactive(capsys, monkeypatch):
    """--interactive prompts for input_type fields not supplied via -d
    (reference cli.py:221-257)."""
    answers = iter(["https://mixed.test/feed.xml"])
    monkeypatch.setattr("builtins.input", lambda prompt="": next(answers))
    rc = main(["test", "spatula_ray.web.TypedDetail", "--interactive",
               "-d", "label=feed",
               "--resolver", "spatula_ray.web:MixedResolverFactory"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "'label': 'feed'" in out
    assert "1 items" in out


def test_cli_shell_command(capsys, monkeypatch):
    """shell fetches the page then drops into an interactive console with
    page/response/client bound (reference cli.py:192-203)."""
    seen = {}

    def fake_embed(user_ns=None, banner1=""):
        seen["banner"] = banner1
        seen["local"] = user_ns

    import IPython

    monkeypatch.setattr(IPython, "embed", fake_embed)
    rc = main(["shell", "spatula_ray.web.SecretFetcher",
               "--resolver", "spatula_ray.web:EmployeesResolverFactory"])
    assert rc == 0
    assert "SecretFetcher" in seen["banner"]
    assert seen["local"]["page"].__class__.__name__ == "SecretFetcher"
    assert seen["local"]["response"].status_code == 200


def upper_dump(obj, f):
    f.write(json.dumps(obj, sort_keys=True).upper())
