import numpy as np

from rendler_ray.functions.canon import (
    canonicalize,
    host_of,
    resolve,
    stable_hash64,
    url_hash_shard,
)


def test_resolve():
    assert resolve("s://h001/p00002", "/p00007") == "s://h001/p00007"
    assert resolve("s://h001/p00002", "s://h002/p00001") == "s://h002/p00001"
    assert resolve("http://a.com/x/y", "z") == "http://a.com/x/z"
    assert resolve("http://a.com/x/y", "/z") == "http://a.com/z"


def test_canonicalize():
    assert canonicalize("HTTP://Example.COM:80/a/../b#frag") == "http://example.com/b"
    assert canonicalize("https://example.com:443/") == "https://example.com/"
    assert canonicalize("https://example.com:8443/x") == "https://example.com:8443/x"
    assert canonicalize("http://example.com") == "http://example.com/"
    assert canonicalize("s://h001/p00002") == "s://h001/p00002"


def test_host_of():
    assert host_of("s://h001/p00002") == "h001"
    assert host_of("http://User@Example.com:8080/x") == "example.com"
    assert host_of("nourl") == ""


def test_stable_hash_is_process_stable():
    urls = [f"s://h{i:03d}/p{i:05d}" for i in range(100)]
    h1 = stable_hash64(urls)
    h2 = stable_hash64(list(urls))
    assert (h1 == h2).all()
    sh = url_hash_shard(urls, 8)
    assert sh.min() >= 0 and sh.max() < 8
    assert len(np.unique(sh)) > 1


def test_hosts_np_matches_host_of():
    import numpy as np

    from rendler_ray.functions.canon import host_of, hosts_np

    urls = [
        "s://h003/p00007",
        "http://Example.COM/path",
        "https://user:pw@Host.Org:8443/x?q=1#f",
        "https://host.org:443/",
        "ftp://h/x",
        "no-scheme-here",
        "s://h4999/p123456",
    ]
    got = hosts_np(np.array(urls, dtype=object))
    exp = [host_of(u) for u in urls]
    assert list(got) == exp


def test_hosts_np_agrees_with_host_of_on_ports_and_colons():
    from rendler_ray.functions.canon import hosts_np

    urls = [
        "s://h001/p00002",
        "http://Example.com:8080/x",          # numeric port: stripped
        "http://host:abc/x",                  # non-numeric: kept
        "http://host:abc",                    # no path
        "http://host:8080",                   # port, no path
        "http://u@host:99/p",                 # userinfo + port
        "http://[_fake_v6_]:443/x",
        "http://host:80:90/x",                # only trailing :digits strips
    ]
    got = hosts_np(np.array(urls, dtype=object))
    want = [host_of(u) for u in urls]
    assert list(got) == want
