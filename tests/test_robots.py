"""robots.txt parsing + filter rule ordering (SURVEY.md §2 S6/M13)."""

from methanol_web_crawler_ray.functions import umex, urlkit
from methanol_web_crawler_ray.functions.robots import (
    ALLOW,
    DENY,
    Filter,
    parse_robots,
)


def u(s):
    return urlkit.url_set(s)


def test_default_allow():
    f = Filter()
    assert f.eval_url(u("http://h.ex/x"))


def test_deny_rule():
    info = parse_robots("User-agent: *\nDisallow: /private/\n")
    assert not info.filter.eval_url(u("http://h.ex/private/x"))
    assert info.filter.eval_url(u("http://h.ex/public/x"))


def test_allow_sorted_before_deny():
    # filter.c:75-84: allow-rules are evaluated before deny-rules
    info = parse_robots(
        "User-agent: *\nDisallow: /private/\nAllow: /private/open/\n"
    )
    assert info.filter.eval_url(u("http://h.ex/private/open/x"))
    assert not info.filter.eval_url(u("http://h.ex/private/shut/x"))


def test_agent_matching_substring():
    body = "User-agent: OtherBot\nDisallow: /\nUser-agent: Methabot\nDisallow: /only/\n"
    info = parse_robots(body, user_agent="Methabot/1.0")
    assert info.filter.eval_url(u("http://h.ex/x"))
    assert not info.filter.eval_url(u("http://h.ex/only/x"))


def test_star_agent():
    info = parse_robots("User-agent: Zz\nDisallow: /a/\nUser-agent: *\nDisallow: /b/\n")
    assert info.filter.eval_url(u("http://h.ex/a/x"))
    assert not info.filter.eval_url(u("http://h.ex/b/x"))


def test_comments_skipped():
    info = parse_robots("# a comment\nUser-agent: *\n# another\nDisallow: /p/\n")
    assert not info.filter.eval_url(u("http://h.ex/p/x"))


def test_rules_before_any_agent_active():
    # worker.c:995: enable starts true
    info = parse_robots("Disallow: /x/\n")
    assert not info.filter.eval_url(u("http://h.ex/x/1"))


def test_crawl_delay_extension():
    info = parse_robots("User-agent: *\nCrawl-delay: 4\nDisallow: /p/\n")
    assert info.crawl_delay == 4.0


def test_filter_add_rule_swap_order():
    # lm_filter_add_rule: ALLOW swaps with the first DENY (filter.c:75-90)
    f = Filter()
    f.add_rule(DENY, umex.strstart("/d1/"))
    f.add_rule(DENY, umex.strstart("/d2/"))
    f.add_rule(ALLOW, umex.strstart("/d1/ok/"))
    allows = [a for a, _ in f.rules]
    assert allows == [True, False, False]
    assert f.eval_url(u("http://h.ex/d1/ok/x"))
    assert not f.eval_url(u("http://h.ex/d1/no"))
