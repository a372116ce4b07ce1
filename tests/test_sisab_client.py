"""SISAB form-state client tests (S4): offline, with a fake transport."""

from __future__ import annotations

import datetime as dt

import pytest

from sm_etl_cloud_run_spark.sources.sisab_client import (
    FormPage,
    SisabReportRequest,
    SisabSession,
)

_HTML = """
<html><body><form>
<input type="hidden" id="javax.faces.ViewState" name="javax.faces.ViewState"
       value="-123:456" />
<select id="unidGeo"><option value="br">Brasil</option></select>
<select id="j_idt76">
  <option value="202401">jan/2024</option>
  <option value="202402">fev/2024</option>
</select>
<select id="selectLinha">
  <option value="ln-br">Brasil</option>
  <option value="ln-mun">Munic&iacute;pio</option>
</select>
<select id="selectcoluna">
  <option value="col-tp">Tipo de Produ&ccedil;&atilde;o</option>
  <option value="col-comp">Compet&ecirc;ncia</option>
</select>
<select id="tpProducao">
  <option value="prod-ai">Atendimento Individual</option>
</select>
<label for="tpIdadeAno">Ano(s)</label>
<input type="radio" id="tpIdadeAno" name="tpIdade" value="idade-anos" />
<label for="catProf">Categoria Profissional:</label>
<select id="catProf">
  <option value="cbo-psi">Psic&oacute;logo</option>
  <option value="cbo-med">M&eacute;dico</option>
</select>
</form></body></html>
"""


def _fake_transport(calls):
    def transport(method, url, **kw):
        calls.append((method, url, kw))
        if method == "GET":
            return _HTML, {"JSESSIONID": "abc123"}
        return "Relatório;...", {}

    return transport


def test_form_page_parses_view_state_and_options():
    page = FormPage.from_html(_HTML)
    assert page.view_state == "-123:456"
    assert page.option_code("selectLinha", "município") == "ln-mun"  # accent/case-insensitive
    assert page.option_code("selectcoluna", "Tipo de Produção") == "col-tp"
    assert page.option_values("j_idt76") == {"202401", "202402"}
    assert page.select_id_for_label("categoria profissional") == "catProf"
    assert page.radio_code("tpIdade", "Anos") == "idade-anos"


def test_request_payload_assembly():
    page = FormPage.from_html(_HTML)
    req = SisabReportRequest(
        page,
        competencias=[dt.date(2024, 1, 1), dt.date(2024, 2, 1)],
        selecoes_adicionais={"Categoria Profissional": ["Psicólogo"]},
    )
    p = req.payload
    assert ("javax.faces.ViewState", "-123:456") in p
    assert ("unidGeo", "br") in p
    assert [v for k, v in p if k == "j_idt76"] == ["202401", "202402"]
    assert ("selectLinha", "ln-br") in p and ("selectcoluna", "col-tp") in p
    assert ("catProf", "cbo-psi") in p
    assert ("idadeInicio", "0") in p and ("idadeFim", "0") in p


def test_request_select_all_expands_options():
    page = FormPage.from_html(_HTML)
    req = SisabReportRequest(
        page,
        competencias=[dt.date(2024, 1, 1)],
        selecoes_adicionais={"Categoria Profissional": "Selecionar Todos"},
    )
    assert [v for k, v in req.payload if k == "catProf"] == ["cbo-psi", "cbo-med"]


def test_request_validation_rules():
    page = FormPage.from_html(_HTML)
    with pytest.raises(ValueError):  # 0 competências
        SisabReportRequest(page, competencias=[])
    with pytest.raises(ValueError):  # 13 competências
        SisabReportRequest(page, competencias=[dt.date(2024, 1, 1)] * 13)
    with pytest.raises(ValueError):  # single unavailable competência
        SisabReportRequest(page, competencias=[dt.date(1999, 1, 1)])
    with pytest.warns(UserWarning):  # several: skip with warning
        req = SisabReportRequest(
            page, competencias=[dt.date(2024, 1, 1), dt.date(1999, 1, 1)]
        )
    assert [v for k, v in req.payload if k == "j_idt76"] == ["202401"]
    with pytest.raises(ValueError):  # age range without idade_tipo
        SisabReportRequest(page, competencias=[dt.date(2024, 1, 1)], faixa_etaria=(1, 5))
    with pytest.raises(ValueError):  # no tipo_producao and no 'Tipo de Produção' axis
        SisabReportRequest(
            page, competencias=[dt.date(2024, 1, 1)], variavel_coluna="Competência"
        )
    with pytest.raises(NotImplementedError):
        SisabReportRequest(
            page, competencias=[dt.date(2024, 1, 1)], unidade_geografica="Municípios"
        )


def test_session_posts_with_jsessionid():
    calls = []
    session = SisabSession(_fake_transport(calls))
    req = SisabReportRequest(session.page, competencias=[dt.date(2024, 1, 1)])
    text = session.download(req)
    assert text.startswith("Relatório")
    method, url, kw = calls[-1]
    assert method == "POST" and url.endswith(";jsessionid=abc123")
    assert kw["data"] == req.payload
    assert kw["cookies"] == {"JSESSIONID": "abc123"}
